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


def psl_rules_dim(spark, rules: Sequence[str]) -> DataFrame:
    """Parse Public Suffix List rules into the joinable dim table the
    100 TB extraction path broadcasts (round 13, VERDICT r12 #4):
    one row per rule with ``base`` (the rule minus any ``*.``/``!``
    marker), ``is_wild`` (``*.foo.jp`` — one extra label is part of
    the public suffix), ``is_exc`` (``!city.foo.jp`` — this exact
    domain is registrable, its TAIL is the public suffix) and
    ``n_labels`` of the base. The real PSL is ~10k such lines —
    comments/blank lines are the caller's parse; this takes the rule
    strings themselves."""
    parsed = []
    for r in rules:
        r = r.strip()
        if not r:
            continue
        is_exc = r.startswith("!")
        is_wild = r.startswith("*.")
        base = r[1:] if is_exc else (r[2:] if is_wild else r)
        parsed.append((base, is_wild, is_exc, base.count(".") + 1))
    return spark.createDataFrame(
        parsed, "base string, is_wild boolean, is_exc boolean, n_labels int"
    )


def psl_host_mapping(
    hosts: DataFrame,
    rules_df: DataFrame,
    host_col: str = "host",
    max_labels: int = 8,
) -> DataFrame:
    """(host, public_suffix, reg_domain) for each DISTINCT host by the
    standard PSL algorithm — the longest-match-against-a-broadcast-dim
    shape the literal ``multi_tlds`` subset approximates:

    1. each host emits its trailing label-suffix CANDIDATES (map-side
       ``transform``+``explode``, capped at the last ``max_labels``
       labels — PSL rules top out at 5, so the cap loses nothing);
    2. candidates equi-join the broadcast rules twice — exact/exception
       rules on ``cand = base``, wildcard rules on ``tail(cand) =
       base`` (both broadcast hash joins; an OR-condition single join
       would fall off the equi path into BNLJ);
    3. per host the PREVAILING rule is the exception if any, else the
       longest public suffix (one max-struct agg over the matched
       candidates — ~1-2 rows per host, not the explode width);
    4. registered domain = public suffix + one preceding host label;
       NULL when the host IS a public suffix. Unmatched hosts take the
       PSL default rule ``*`` (public suffix = last label).

    Scale shape: this runs on DISTINCT hosts — registered-domain
    extraction is a pure function of the host, so the corpus never
    explodes; the mapping is a host-cardinality dim joined back
    (:func:`url_registered_domain_psl`). The exchanges here are over
    matched (host, rule) rows and the distinct hosts themselves.

    ``max_labels`` is validated against the rules dim at build time
    (round-14 ADVICE): a rule longer than the candidate window would
    silently mis-extract (its hosts would fall to shorter rules or the
    ``*`` default) — refuse loudly instead. Today's PSL tops out at 5
    labels, so the default window of 8 clears the check; the dim is
    rule-count sized, so the one-row max() probe is free."""
    max_rule = rules_df.agg(F.max("n_labels")).first()[0] or 1
    if int(max_rule) + 1 > int(max_labels):
        raise ValueError(
            f"psl_host_mapping: rules carry up to {max_rule} labels; "
            f"registered-domain extraction needs max_labels >= "
            f"{int(max_rule) + 1}, got {max_labels}"
        )
    labels = F.split(F.col(host_col), r"\.")
    n = F.size(labels)
    lo = F.greatest(F.lit(0), n - F.lit(int(max_labels)))
    # the candidate lambda's body references `labels` (re-evaluated per
    # element in interpreted HOF eval — the round-12/13 lesson); here
    # that is ≤ max_labels re-splits of ONE host string per DISTINCT
    # host (dim-sized input, variable-length slices that don't zip), so
    # the body-safe restructure would buy nothing measurable
    cand_structs = F.transform(
        F.sequence(lo + 1, n),
        lambda i: F.struct(
            F.array_join(F.slice(labels, i, n - i + 1), ".").alias("cand"),
            F.when(i >= 2, F.get(labels, i - 2)).alias("prev_label"),
            F.when(
                i < n, F.array_join(F.slice(labels, i + 1, n - i), ".")
            ).alias("cand_tail"),
            (n - i + 1).cast("int").alias("cand_labels"),
        ),
    )
    cands = hosts.select(
        F.col(host_col), F.explode(cand_structs).alias("c")
    ).select(host_col, "c.cand", "c.prev_label", "c.cand_tail", "c.cand_labels")
    exact = cands.join(
        F.broadcast(rules_df.filter(~F.col("is_wild"))),
        F.col("cand") == F.col("base"),
    )
    wild = cands.join(
        F.broadcast(rules_df.filter(F.col("is_wild"))),
        F.col("cand_tail") == F.col("base"),
    )
    matched = exact.unionByName(wild).select(
        host_col,
        F.struct(
            F.col("is_exc"),
            # public-suffix length ranks the prevail (exceptions first)
            F.when(F.col("is_exc"), F.col("cand_labels") - 1)
            .otherwise(F.col("cand_labels"))
            .alias("ps_labels"),
            F.when(F.col("is_exc"), F.col("cand_tail"))
            .otherwise(F.col("cand"))
            .alias("ps"),
            F.when(F.col("is_exc"), F.col("cand"))
            .otherwise(
                F.when(
                    F.col("prev_label").isNotNull(),
                    F.concat_ws(".", F.col("prev_label"), F.col("cand")),
                )
            )
            .alias("reg"),
        ).alias("m"),
    )
    prevail = matched.groupBy(host_col).agg(F.max("m").alias("m"))
    out = hosts.join(prevail, host_col, "left")
    last1 = F.get(labels, n - 1)
    last2_reg = F.when(n >= 2, F.concat_ws(".", F.get(labels, n - 2), last1))
    return out.select(
        host_col,
        F.coalesce(F.col("m.ps"), last1).alias("public_suffix"),
        F.when(F.col("m").isNotNull(), F.col("m.reg"))
        .otherwise(last2_reg)
        .alias("reg_domain"),
    )


def url_registered_domain_psl(
    df: DataFrame,
    rules_df: DataFrame,
    host_col: str = "host",
    out_col: str = "reg_domain",
) -> DataFrame:
    """Registered domain via the full PSL broadcast-dim path: compute
    the mapping over DISTINCT hosts (:func:`psl_host_mapping`) and
    broadcast-join it back — at 100 TB the corpus side stays a
    streamed scan; only the host dim shuffles. Correct where the
    literal subset path (:func:`url_registered_domain`) mis-groups:
    multi-part suffixes outside the subset (``site.gov.cn`` no longer
    merges every .gov.cn site into one curation bucket), wildcard
    rules (``*.nom.br``), and exception rules
    (``!city.kawasaki.jp``)."""
    mapping = psl_host_mapping(
        df.select(host_col).distinct(), rules_df, host_col
    ).select(
        host_col, F.col("reg_domain").alias(out_col)
    )
    return df.join(F.broadcast(mapping), host_col, "left")


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
