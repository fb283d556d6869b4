"""KMV (k-minimum-values) distinct-count sketches — the mergeable
approx-distinct tier the oracle can actually check.

HLL (occupancy_approx) has engine-specific hashing, so its oracle
check has been rows-only since round 1. KMV closes that gap: the
sketch is the k lexicographically smallest md5 digests of a key set —
pure deterministic arithmetic both engines own — and the classic
estimator distinct ≈ (k−1)/U(k) (Bar-Yossef et al. 2002, the
bottom-k / KMV family; DataSketches' theta sketch is its production
descendant) uses the k-th minimum mapped to (0,1) by its 32-bit hex
prefix. Everything hashes, ranks and divides identically in Spark and
DuckDB, so the ESTIMATE itself is value-hash exact cross-engine while
still being a genuine approximation of the true count.

Why KMV and not just countDistinct: MERGEABILITY. A per-(group, day)
sketch is a fixed k-row artifact; the union of any set of days is
re-ranking the unioned sketch rows — k smallest of the union of
per-day k-minima IS the k-minima of the union (a hash among the
global k smallest has < k hashes below it in ANY day that contains
it, so every component sketch retains it). At 100 TB you persist the
daily sketches (k rows per group, not the key sets) and cross-day /
cross-partition rollups touch sketches only; the build pays one
distinct + one per-group top-k window, the merge tier is
sketch-sized. The reference has no approx-distinct tier at all —
engine extension (SURVEY.md §2.4 aggregation family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: sketch size — 256 minima ≈ 6% standard error, 8 KB per group
KMV_K = 256


def kmv_hash(key: Column, salt: str = "kmv") -> Column:
    """The sketch hash: md5 over the salted stringified key. Ordering
    is lexicographic over the hex digest — identical in both
    engines."""
    return F.md5(F.concat(F.lit(salt + ":"), key.cast("string")))


def kmv_sketch(
    keyed: DataFrame, group_cols: list[str], k: int = KMV_K
) -> DataFrame:
    """(group_cols…, hx) — the k smallest DISTINCT hashes per group
    over a frame carrying an ``hx`` hash column. One distinct + one
    per-group rank window; the output is the fixed-size mergeable
    artifact."""
    w = Window.partitionBy(*group_cols).orderBy("hx")
    return (
        keyed.select(*group_cols, "hx")
        .distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(*group_cols, "hx")
    )


def kmv_merge(
    sketches: DataFrame, group_cols: list[str], k: int = KMV_K
) -> DataFrame:
    """Merge sketches down to coarser groups: distinct the unioned
    hash rows, re-take the k smallest per surviving group. Exact KMV
    semantics — the merged sketch equals the sketch built directly on
    the union. Keeps ``rk`` (the merged rank) for the estimator."""
    w = Window.partitionBy(*group_cols).orderBy("hx")
    return (
        sketches.select(*group_cols, "hx")
        .distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def kmv_estimate(
    merged: DataFrame, group_cols: list[str], k: int = KMV_K
) -> DataFrame:
    """(group_cols…, sketch_size, n_est) from a merged sketch with
    ``rk``: below saturation the sketch IS the distinct set (estimate
    = size, exact); at saturation the classic (k−1)/U(k) with U(k) =
    the k-th minimum's leading-8-hex value / 2³². All arithmetic
    (conv-from-hex, one division) is deterministic and mirrored
    digit-for-digit by the SQL twin."""
    uk = (
        F.conv(F.substring("hx", 1, 8), 16, 10).cast("long")
        / F.lit(4294967296.0)
    )
    agg = merged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("sketch_size"),
        F.max(F.when(F.col("rk") == k, uk)).alias("uk"),
    )
    est = F.when(
        F.col("sketch_size") < k, F.col("sketch_size").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("uk"))
    return agg.select(*group_cols, "sketch_size", est.alias("n_est"))


def kmv_u32(hx: Column) -> Column:
    """The digest's leading-8-hex value mapped to (0, 1) — the
    uniform variate the estimators divide by."""
    return F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") / F.lit(
        4294967296.0
    )


def kmv_set_ops(
    sketches: DataFrame, group_col: str, k: int = KMV_K
) -> DataFrame:
    """Pairwise SET-ALGEBRA estimates from per-group sketches — the
    theta-sketch intersection trick (Dasgupta et al., the DataSketches
    lineage): for groups A, B with sketch thresholds θ_A, θ_B (the
    k-th minimum as a (0,1) variate; 1.0 when unsaturated, i.e. the
    sketch IS the complete set), every hash below θ = min(θ_A, θ_B)
    is retained by BOTH sketches iff it is in both underlying sets,
    so |A∩B| ≈ |skA ∩ skB ∩ {u < θ}| / θ. Per-group cardinalities
    come from the sketches' own (k−1)/θ estimates and the union via
    inclusion-exclusion, giving a Jaccard estimate that never touches
    the raw sets. Input: (group_col, hx, rk) sketch rows
    (:func:`kmv_merge` output or :func:`kmv_sketch` + a rank).
    Output: one row per unordered group pair (ga < gb) with est_a,
    est_b, est_inter, est_jaccard — everything deterministic md5
    arithmetic, sketch-sized joins only."""
    stats = sketches.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("sz"),
        F.coalesce(
            F.max(F.when(F.col("rk") == k, kmv_u32(F.col("hx")))),
            F.lit(1.0),
        ).alias("theta"),
    )
    est_g = F.when(
        F.col("sz") < k, F.col("sz").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("theta"))
    g = stats.select(
        F.col(group_col).alias("g"), est_g.alias("est"), "theta"
    )
    a = sketches.select(
        F.col(group_col).alias("ga"), "hx"
    )
    b = sketches.select(F.col(group_col).alias("gb"), "hx")
    shared = (
        a.join(b, "hx")
        .filter(F.col("ga") < F.col("gb"))
        .join(
            g.select(F.col("g").alias("ga"), F.col("theta").alias("ta"),
                     F.col("est").alias("est_a")),
            "ga",
        )
        .join(
            g.select(F.col("g").alias("gb"), F.col("theta").alias("tb"),
                     F.col("est").alias("est_b")),
            "gb",
        )
    )
    theta = F.least(F.col("ta"), F.col("tb"))
    below = (kmv_u32(F.col("hx")) < theta).cast("int")
    pairs = shared.groupBy(
        "ga", "gb", "ta", "tb", "est_a", "est_b"
    ).agg(F.sum(below).alias("n_below"))
    est_inter = F.col("n_below") / F.least(F.col("ta"), F.col("tb"))
    est_union = F.col("est_a") + F.col("est_b") - est_inter
    return pairs.select(
        "ga",
        "gb",
        "est_a",
        "est_b",
        est_inter.alias("est_inter"),
        (est_inter / est_union).alias("est_jaccard"),
    )
