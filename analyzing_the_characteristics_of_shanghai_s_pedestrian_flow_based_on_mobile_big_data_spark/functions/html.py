"""HTML → text extraction — the first stage of a crawl pipeline.

Raw web documents arrive as markup; every downstream gate (language
ID, quality, dedup, decontam) operates on extracted TEXT. This module
is the Spark-first extraction stage: pure regexp/replace Column
expressions (whole-stage codegen, no parser library, no Python), with
the DuckDB twin using the identical regex/replace chains — so the
extracted text, and therefore every downstream verdict, is bit-exact
cross-engine.

Scope (documented, deliberate): tag stripping handles well-formed
tags including attributes; ``<script>``/``<style>`` elements drop
with their CONTENT (the two elements whose text is never prose);
the named entities every crawl actually contains (amp/lt/gt/quot/
apos/nbsp) plus decimal numeric entities for the ASCII range decode;
whitespace squeezes to single spaces. A full HTML5 parser tolerates
malformed markup this does not claim to — the stub boundary is the
regex grammar, stated here rather than hidden.

Order matters and is part of the contract: script/style elements
first (their content must not survive tag stripping), then tags,
then entities (so ``&lt;b&gt;`` decodes to literal ``<b>`` and is
NOT re-stripped — the standard double-decode defense), then
whitespace normalization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (pattern, replacement) chain — shared with the SQL twin builder so
#: the two can never drift. RE2/Java-compatible: no backreferences,
#: (?s) via [\s\S].
HTML_STRIP_STEPS: tuple[tuple[str, str], ...] = (
    # script/style elements WITH content (non-greedy, case-insensitive)
    (r"(?i)<script[^>]*>[\s\S]*?</script>", " "),
    (r"(?i)<style[^>]*>[\s\S]*?</style>", " "),
    # comments, then any remaining tag
    (r"<!--[\s\S]*?-->", " "),
    (r"<[^>]+>", " "),
)

#: plain-replace entity decodes, applied AFTER tag stripping;
#: &amp; LAST so "&amp;lt;" becomes "&lt;" (one decode pass, the
#: standard defense against double-decoding)
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
)


def html_to_text(html: Column) -> Column:
    """Extracted text of an HTML column: strip chain → entity decode →
    whitespace squeeze → trim. One pass of compiled-regex/replace
    expressions on the scan."""
    s = F.coalesce(html, F.lit(""))
    for pat, rep in HTML_STRIP_STEPS:
        s = F.regexp_replace(s, pat, rep)
    for ent, ch in HTML_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.regexp_replace(s, r"\s+", " ")
    return F.trim(s)


def html_to_text_sql(col: str) -> str:
    """The DuckDB twin of :func:`html_to_text` over column ``col`` —
    built from the SAME step tables, so the chains cannot drift."""
    s = f"coalesce({col}, '')"
    for pat, rep in HTML_STRIP_STEPS:
        s = f"regexp_replace({s}, '{pat}', '{rep}', 'g')"
    for ent, ch in HTML_ENTITIES:
        ch_sql = ch.replace("'", "''")
        s = f"replace({s}, '{ent}', '{ch_sql}')"
    return f"trim(regexp_replace({s}, '\\s+', ' ', 'g'))"
