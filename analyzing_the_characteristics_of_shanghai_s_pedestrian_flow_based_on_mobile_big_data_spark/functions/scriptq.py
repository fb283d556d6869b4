"""Script-aware text quality — token proxies and quality gates that
survive scriptio continua.

The whitespace quality stack (functions/text.py) silently destroys
text in scripts written WITHOUT word spaces: a Chinese document is ONE
whitespace token, so the token floor rejects it, quality_score's
length term reads ~0.01, and any word-shingle repetition metric sees a
single giant word. Spaced non-Latin scripts fare no better on the
quality side — punct_ratio counts every non-``[a-z0-9 ]`` character as
noise, so Russian or Hindi prose scores ~0 "quality" however clean it
is. Production multilingual curation (the CCNet / mC4 / FineWeb-2
lineage) therefore routes its metrics by script: continua scripts
count characters as the token proxy, and prose-ness is letter density
over the document's OWN script rather than English stopword hits.

Everything here is one-compiled-regex codegen arithmetic sharing
``SCRIPT_CLASSES`` with the language classifier (functions/langid.py),
so the quality gates and the classifier agree on what a script is, and
the DuckDB twin is the identical ``length − length(regexp_replace)``
/ division arithmetic — bit-exact doubles (probed: the char-trigram
slice and the division chains reproduce to the last ulp across
engines on CJK/Thai/Devanagari fixtures before adoption).

Scale shape: every function is a scalar expression over the scanned
text column — no join, no shuffle, no Python. At 100 TB the whole
script-aware gate stack rides the scan exactly like the Latin stack
it generalizes.

Cf. reference quality heuristics (SURVEY.md §2.8 scalar-function
family); the reference corpus is monolingual so it never needed this —
the multilingual gate is an engine extension in the Gopher/CCNet
tradition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .langid import SCRIPT_CLASSES
from .text import tokens

#: scripts written without word-separating spaces — the token proxy
#: for these is the character count (CJK tokenizers emit roughly one
#: token per character; Thai segmentation is dictionary-based and
#: space-free). Hangul, Devanagari, Arabic, Hebrew, Greek and
#: Cyrillic all use spaces and keep whitespace tokenization.
CONTINUA_SCRIPTS: tuple[str, ...] = ("han", "kana", "thai")


def _merged_class(keys) -> str:
    """One char class merging the ranges of several SCRIPT_CLASSES
    entries (each is a single ``[...]`` class, so inner concatenation
    is well-formed)."""
    return "[" + "".join(SCRIPT_CLASSES[k][1:-1] for k in sorted(keys)) + "]"


#: the three continua ranges as one class
CONTINUA_CLASS: str = _merged_class(CONTINUA_SCRIPTS)
#: letters of ANY of the 10 known scripts
LETTER_CLASS: str = _merged_class(SCRIPT_CLASSES)
#: characters that are NOT noise in any script: letters + digits + space
CLEAN_CLASS: str = "[" + LETTER_CLASS[1:-1] + "0-9 ]"


def _class_count(s: Column, cls: str) -> Column:
    """Code points of ``s`` inside char class ``cls`` — one compiled
    regex scan, the langid script_count arithmetic."""
    return F.length(s) - F.length(F.regexp_replace(s, cls, ""))


def continua_char_count(s: Column) -> Column:
    """Characters of the han/kana/thai continua blocks in a LOWERCASED
    text column."""
    return _class_count(s, CONTINUA_CLASS)


def letter_count(s: Column) -> Column:
    """Characters belonging to any known script (Latin counts [a-z]
    on the lowered string, like the classifier)."""
    return _class_count(s, LETTER_CLASS)


def is_continua(s: Column) -> Column:
    """True when the majority of a document's LETTERS are continua
    script — the routing predicate for char-based vs word-based
    metrics. Majority (not mere presence) so a Latin document quoting
    a CJK phrase keeps its word-based metrics, mirroring the
    classifier's dominant-script routing."""
    return continua_char_count(s) * 2 > letter_count(s)


def script_token_count(text: Column) -> Column:
    """Script-aware token proxy: every continua character counts one
    token, and the REMAINING text (continua characters replaced by
    spaces, so boundaries split) contributes whitespace tokens. Equals
    functions.text.token_count on pure spaced-script text; equals the
    character count on pure CJK/Thai text; adds the two on mixed
    documents."""
    s = F.lower(F.coalesce(text, F.lit("")))
    stripped = F.regexp_replace(s, CONTINUA_CLASS, " ")
    return (continua_char_count(s) + F.size(tokens(stripped))).cast("int")


def letter_ratio(text: Column) -> Column:
    """Fraction of characters that are letters of ANY script — the
    script-agnostic prose-ness signal (replaces English stopword hits,
    which read 0 on every non-English document)."""
    s = F.lower(F.coalesce(text, F.lit("")))
    return F.when(
        F.length(s) > 0, letter_count(s) / F.length(s)
    ).otherwise(F.lit(0.0))


def punct_ratio_script(text: Column) -> Column:
    """Fraction of characters that are noise in EVERY script: not a
    letter of any known script, not a digit, not a space — the
    punct_ratio shape with the clean class widened beyond ASCII."""
    s = F.lower(F.coalesce(text, F.lit("")))
    noise = F.length(F.regexp_replace(s, CLEAN_CLASS, ""))
    return F.when(F.length(s) > 0, noise / F.length(s)).otherwise(
        F.lit(0.0)
    )


def quality_score_script(text: Column) -> Column:
    """Script-aware document quality in [0,1] — the quality_score
    shape with each term generalized: length over the script-aware
    token proxy, prose-ness as letter density (×1.25, saturating at
    clean prose's ~80% letter fraction), noise over the all-script
    clean class. Deterministic double arithmetic, division order
    matching the SQL twin exactly."""
    n = script_token_count(text)
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    prose = F.least(letter_ratio(text) * 1.25, F.lit(1.0))
    noise = punct_ratio_script(text)
    return (len_score + prose + (1.0 - noise)) / F.lit(3.0)


def char_ngram_dup_frac(s: Column, n: int = 3) -> Column:
    """Duplicate char n-gram fraction — the repetition metric for
    continua text, where word shingles see one giant word:
    1 − distinct/total over the sliding char n-grams of ``s``.
    0.0 for texts shorter than ``n``.

    ``s`` must be a STAGED lowercased column (a bare attribute): the
    transform lambda's body references it, and interpreted HOF eval
    re-computes inline body children per ELEMENT (the word_shingles
    lesson) — an attribute is safe, an expression is O(len²).

    Work is O(len·n) per document on the scan; both engines slice
    code-point-wise (probed on CJK/Thai/Devanagari: identical trigram
    lists and bit-equal fractions)."""
    total = F.length(s) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), total), lambda i: F.substring(s, i, n)
    )
    # sequence(1, total) COUNTS DOWN when total < 1 — guard first
    return F.when(
        F.length(s) >= n,
        1.0 - F.size(F.array_distinct(grams)).cast("double") / total,
    ).otherwise(F.lit(0.0))
