"""URL/domain-aware curation primitives — native, engine-portable.

Real web corpora key their curation on the URL host and registered
domain (per-domain dedup caps, domain blocklists, domain-level
mixture recipes) rather than on a free-text ``source`` column
(VERDICT r11 #2). Everything here is pure Catalyst string/array
expressions in the Java∩RE2-portable regex subset (the PII-guard
contract, operators/dedup.py:_check_portable_patterns), so a DuckDB
oracle can restate each step verbatim — no UDF, no shuffle: at
100 TB host/domain extraction is a streamed projection exactly as
cheap as the scan.

Registered-domain extraction uses a LITERAL multi-part public-suffix
subset (``DEFAULT_MULTI_TLDS``): the full Public Suffix List is a
~10k-row data file a production deployment ships as a broadcast dim
table (join host suffixes against it longest-match-first); the
operator keeps that pluggable via the ``multi_tlds`` parameter while
staying self-contained — the heuristic (last two labels, or three
when the last two are a known multi-part suffix) covers the common
ccTLD second-level registries and is exactly wrong only for PSL
entries outside the provided set.

No counterpart in the reference (its inputs carry no URLs) — engine
breadth for the curation stack (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Common multi-part registry suffixes; a production run swaps in the
# full Public Suffix List as a broadcast table (see module docstring).
DEFAULT_MULTI_TLDS: tuple[str, ...] = (
    "co.uk",
    "org.uk",
    "ac.uk",
    "gov.uk",
    "com.cn",
    "net.cn",
    "com.au",
    "com.br",
    "co.jp",
    "co.in",
)

# Group 1 = authority minus userinfo; ports stripped separately so the
# regex stays in the portable subset (non-capturing groups are RE2-safe,
# the PII guard allows them).
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/?#]+)"


def url_host(url: Column) -> Column:
    """Lower-cased host of an ABSOLUTE URL: the authority component
    with userinfo and port stripped. Scheme-less strings yield ''
    (regexp_extract's no-match value in both engines) — callers that
    ingest scheme-relative or bare-host URLs should normalize
    upstream. Pure map-side expression."""
    raw = F.regexp_extract(url, _HOST_RE, 1)
    return F.lower(F.regexp_replace(raw, r":[0-9]+$", ""))


def url_registered_domain(
    host: Column, multi_tlds: Sequence[str] = DEFAULT_MULTI_TLDS
) -> Column:
    """Registered (pay-level) domain of a host: the last two labels,
    or the last three when the trailing two are a known multi-part
    suffix (``multi_tlds``) — so ``blog.site.co.uk`` keys as
    ``site.co.uk``, not ``co.uk`` (which would merge every .co.uk
    site into one curation bucket). Hosts with fewer than two labels
    (IPs are out of scope, bare labels, '') pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # F.get (0-based) returns NULL out of bounds instead of erroring
    # under ANSI mode (Spark 4 default); concat_ws skips NULLs, and the
    # n-guards below make the short cases unreachable anyway
    l1 = F.get(labels, n - 1)
    l2 = F.get(labels, n - 2)
    l3 = F.get(labels, n - 3)
    last2 = F.concat_ws(".", l2, l1)
    last3 = F.concat_ws(".", l3, l2, l1)
    return (
        F.when((n >= 3) & last2.isin(*multi_tlds), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def url_suffix(reg_domain: Column) -> Column:
    """The public-suffix part of a registered domain (everything after
    its first label): ``site3.co.uk`` → ``co.uk`` — the key a
    TLD-level mixture recipe uses. Single-label inputs yield the input
    unchanged (regexp_replace finds no dot to strip)."""
    return F.regexp_replace(reg_domain, r"^[^.]*[.]", "")


# Query parameters stripped by canonicalization: tracking/session ids
# that vary per click while pointing at the same resource — the reason
# a crawl holds N copies of one page under N urls.
TRACKING_PARAM_RE = r"^(utm_[a-z]+|gclid|fbclid|ref)="


def url_canonicalize(url: Column) -> Column:
    """Canonical form of an ABSOLUTE URL — the normalize-before-dedup
    step a web corpus runs so url-level exact dedup actually merges
    the same page crawled under click-tracking variants:

    - scheme and host lowercased; userinfo stripped;
    - default ports dropped (``:80`` for http, ``:443`` for https;
      other ports kept — they address different services);
    - fragment dropped (never sent to the server);
    - tracking query params dropped (``TRACKING_PARAM_RE``), the
      remainder SORTED so param order cannot split a dedup group;
      the ``?`` disappears with the last param;
    - empty path normalized to ``/``; one trailing slash stripped
      from non-root paths.

    Deliberately NOT done (each changes meaning for some sites, so a
    corpus pipeline must opt in explicitly): %-encoding
    normalization, path dot-segment resolution, www-stripping, and
    scheme upgrades. Pure portable string/array expressions — the
    DuckDB twin restates every step; the only dialect split is the
    replacement-string syntax ($1 vs \\1), the PATTERNS are shared."""
    scheme = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment
    authority = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    pathq = F.regexp_replace(rest, r"^[^/?#]*", "")
    hostport = F.lower(F.regexp_replace(authority, r"^[^@]*@", ""))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_replace(pathq, r"^[^?]*\??", "")
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    canon_q = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    path_n = F.regexp_replace(path, r"(.)/$", r"$1")
    path_n = F.when(path_n == "", F.lit("/")).otherwise(path_n)
    canon = F.concat(scheme, F.lit("://"), host, path_n, canon_q)
    # scheme-less strings are not canonicalizable — NULL, explicitly,
    # so a dedup keyed on the canonical form can isolate them instead
    # of merging every malformed row into one '://...' group
    return F.when(scheme != "", canon).otherwise(F.lit(None))


def apply_domain_blocklist(
    df: DataFrame, domain_col: str, blocklist: DataFrame
) -> DataFrame:
    """Drop rows whose domain appears in ``blocklist`` (a one-column
    DataFrame of domains) via a BROADCAST LEFT-ANTI join — the 100 TB
    shape: a real blocklist is millions of registered domains, a dim
    table to broadcast, not an ``isin`` literal to inline into the
    plan (a multi-MB IN-list blows up codegen and re-ships with every
    task binary anyway). The corpus side never shuffles; NULL/''
    domains in the blocklist never match anything (anti-join NULL
    semantics), so a sloppy blocklist row cannot nuke the
    scheme-less-URL rows."""
    bl = blocklist.select(
        F.col(blocklist.columns[0]).alias(domain_col)
    ).distinct()
    return df.join(F.broadcast(bl), domain_col, "left_anti")


def cap_per_domain(
    df: DataFrame,
    domain_col: str,
    cap: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain dedup cap: keep at most ``cap`` rows per domain,
    chosen by the md5 hash order of ``id_col`` (tie: id asc) — the
    hash pick is deterministic, engine-portable, and uncorrelated
    with ingest order, so a crawl that emits one hot domain first
    doesn't bias which of its pages survive (the
    ivf_centroid_rows/stratified-sample argument). Returns the kept
    rows with their ``rk`` (1-based hash rank within the domain).

    Scale shape: the ``row_number() <= cap`` filter is exactly the
    pattern Spark's WindowGroupLimit rewrite pushes below the
    exchange — each map task pre-limits every domain to its top-cap
    rows BEFORE the shuffle, so a hot domain ships ~cap rows per
    input partition instead of its full page set (plan-pinned in
    tests/test_functions.py:test_cap_per_domain_window_group_limit).
    Emitting only kept rows (not an all-rows boolean) is what makes
    that pushdown legal."""
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(cap))
    )
