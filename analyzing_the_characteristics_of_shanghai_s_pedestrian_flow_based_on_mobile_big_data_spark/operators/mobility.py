"""Per-user mobility characteristics over the region grid.

The metrics the pedestrian-flow literature derives from exactly the
hourly-position table this engine already builds (reference scope:
cal_user_trace.py / cal_mobility_matrix.py produce the positions and
the OD flows; the per-user characteristic statistics — radius of
gyration, visitation frequency, location predictability — are the
standard companions from the mobile-big-data papers the reference
cites, e.g. González et al. 2008 "Understanding individual human
mobility patterns").

All five operators consume the deterministic (user_id, hour,
region_id) hourly-position table and place regions on the engine's
5×W grid (region_id 1-based, row-major), so every coordinate is a
small BIGINT and every aggregate moment (Σx, Σx², Σn·x, …) is exact
integer arithmetic. Cross-engine float discipline (the module-wide
rule): the ONLY floating-point operations are a final correctly
rounded IEEE sqrt and/or one division of exact BIGINTs — both produce
identical binary64 on Spark and DuckDB, so the driver's repr()-exact
hash cannot diverge.

Scale notes (100 TB):
- every operator is one groupBy over (user) or (user, region) after
  the positions aggregate — map-side partial aggregation collapses
  each executor's pings before the shuffle, so shuffle volume is
  O(users · visited-regions), not O(pings);
- no windows over raw pings: the only window (visitation rank,
  jump lag) runs on the already-collapsed per-user tables whose
  per-key cardinality is bounded by regions (20) or hours observed;
- nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grid_xy(region_col: F.Column, width: int = 5) -> tuple[F.Column, F.Column]:
    """Row-major 1-based region id → (x, y) BIGINT grid coordinates."""
    z = (region_col - 1).cast("bigint")
    return F.pmod(z, F.lit(width)).alias("x"), (z / width).cast("bigint").alias("y")


def rog_from_moments(mom: DataFrame) -> DataFrame:
    """(user_id, n, sx, sy, sxx, syy) exact integer moments → rog.

    Shared by the batch operator and the streaming moment table
    (streaming/incremental.py): because the moments are ADDITIVE
    BIGINTs, any way of accumulating them — one batch aggregate, many
    micro-batch merges, replayed epochs — yields the identical rog
    bits from this one sqrt+division epilogue.
    """
    n = F.col("n")
    num = (
        n * F.col("sxx")
        - F.col("sx") * F.col("sx")
        + n * F.col("syy")
        - F.col("sy") * F.col("sy")
    )
    return mom.select(
        "user_id",
        n.alias("n_obs"),
        (F.sqrt(num.cast("double")) / n.cast("double")).alias("rog"),
    )


def grid_moments(
    pts: DataFrame, user_col: str = "user_id"
) -> DataFrame:
    """(user_id, x, y) points → per-user additive BIGINT moments."""
    return pts.groupBy(F.col(user_col).alias("user_id")).agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )


def radius_of_gyration(
    positions: DataFrame, width: int = 5, user_col: str = "user_id"
) -> DataFrame:
    """Per-user radius of gyration over grid cells.

    rog = sqrt( Σ‖rᵢ − r̄‖² / n ) computed in the expanded exact form
    n·Σx² − (Σx)² (+ same for y) over integer grid coordinates, so the
    numerator is a single exact BIGINT and the whole metric is
    sqrt(BIGINT)/n — two correctly rounded IEEE ops, bit-identical on
    any engine and any partitioning (no double summation anywhere).

    Output: (user_id, n_obs, rog) — rog in grid-cell units.
    """
    x, y = grid_xy(F.col("region_id"), width)
    pts = positions.select(F.col(user_col).alias("user_id"), x, y)
    return rog_from_moments(grid_moments(pts))


def location_diversity(
    positions: DataFrame, user_col: str = "user_id"
) -> DataFrame:
    """Effective number of visited regions per user — the inverse
    Simpson index N²/Σnᵢ² (the log-free twin of location entropy:
    same ordering, but exact — one IEEE division of exact BIGINT
    products instead of a libm log per region).

    Output: (user_id, n_regions, n_obs, eff_regions).
    """
    counts = (
        positions.groupBy(F.col(user_col).alias("user_id"), "region_id")
        .agg(F.count("*").alias("c"))
    )
    agg = counts.groupBy("user_id").agg(
        F.count("*").alias("n_regions"),
        F.sum("c").alias("n_obs"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    return agg.select(
        "user_id",
        "n_regions",
        "n_obs",
        (
            (F.col("n_obs") * F.col("n_obs")).cast("double")
            / F.col("s2").cast("double")
        ).alias("eff_regions"),
    )


def top_location_share(
    positions: DataFrame, user_col: str = "user_id"
) -> DataFrame:
    """Per-user most-visited region and its visit share — the
    zeroth-order predictability of the user (how often does the
    single best guess hit). Ties break to the smallest region_id via
    max_by over the (count, −region) struct, which keeps the whole
    operator two map-combinable aggregates (no window over pings).

    Output: (user_id, top_region, n_obs, top_share).
    """
    counts = (
        positions.groupBy(F.col(user_col).alias("user_id"), "region_id")
        .agg(F.count("*").alias("c"))
    )
    agg = counts.groupBy("user_id").agg(
        F.sum("c").alias("n_obs"),
        F.max(
            F.struct(
                F.col("c").alias("c"),
                (-F.col("region_id")).alias("neg_region"),
            )
        ).alias("top"),
    )
    return agg.select(
        "user_id",
        (-F.col("top.neg_region")).cast("int").alias("top_region"),
        "n_obs",
        (
            F.col("top.c").cast("double") / F.col("n_obs").cast("double")
        ).alias("top_share"),
    )


def jump_length_histogram(
    positions: DataFrame, width: int = 5, user_col: str = "user_id"
) -> DataFrame:
    """Distribution of per-hop displacement over consecutive hourly
    positions: Chebyshev distance on the region grid (integer — the
    trig-free stand-in for the haversine jump length, so every bucket
    boundary is exact). The lag window runs per user over the already
    hour-collapsed positions, not raw pings.

    Output: (dist, n_hops, n_users).
    """
    x, y = grid_xy(F.col("region_id"), width)
    pts = positions.select(
        F.col(user_col).alias("user_id"), F.col("hour"), x, y
    )
    w = Window.partitionBy("user_id").orderBy("hour")
    hops = (
        pts.withColumn("px", F.lag("x").over(w))
        .withColumn("py", F.lag("y").over(w))
        .filter(F.col("px").isNotNull())
        .select(
            "user_id",
            F.greatest(
                F.abs(F.col("x") - F.col("px")),
                F.abs(F.col("y") - F.col("py")),
            ).alias("dist"),
        )
    )
    return hops.groupBy("dist").agg(
        F.count("*").alias("n_hops"),
        F.countDistinct("user_id").alias("n_users"),
    )


def visitation_rank_curve(
    positions: DataFrame, max_rank: int = 10, user_col: str = "user_id"
) -> DataFrame:
    """Zipf curve of location visitation: rank each user's regions by
    visit count (ties → smaller region_id), then aggregate visits by
    rank across users. The mobility-paper check that visitation
    frequency decays ~k^-1.2 — here kept exact: per-rank totals are
    BIGINTs and the mean is one IEEE division.

    The rank window partitions by user over ≤ n_regions rows per user
    (bounded, never skewed). Output: (rank, n_users, total_visits,
    avg_visits).
    """
    counts = (
        positions.groupBy(F.col(user_col).alias("user_id"), "region_id")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("c").desc(), F.col("region_id").asc()
    )
    # named rnk, not rank: RANK is a reserved word in the DuckDB twin
    ranked = counts.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= max_rank
    )
    return ranked.groupBy("rnk").agg(
        F.count("*").alias("n_users"),
        F.sum("c").alias("total_visits"),
        (
            F.sum("c").cast("double")
            / F.count("*").cast("double")
        ).alias("avg_visits"),
    )


def exploration_curve(positions: DataFrame) -> DataFrame:
    """New-place discovery curve (the Song et al. exploration /
    preferential-return signature): at each visit index n (a user's
    n-th hourly position, time-ordered), what fraction of users are in
    a region they have never visited before?

    Two windows over the same (user, hour) ordering — visit index and
    first-visit flag (row 1 of the (user, region) partition) — then a
    visit-index aggregate. Payload is one row per position; the output
    is bounded by the longest trajectory. The division is the single
    float op over two exact counts, so both engines agree bit-for-bit.
    Returns (visit_idx, n_visits, n_new, new_frac).
    """
    w_seq = Window.partitionBy("user_id").orderBy("hour")
    w_first = Window.partitionBy("user_id", "region_id").orderBy("hour")
    flagged = positions.select(
        F.row_number().over(w_seq).alias("visit_idx"),
        (F.row_number().over(w_first) == 1).alias("is_new"),
    )
    return flagged.groupBy("visit_idx").agg(
        F.count("*").alias("n_visits"),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias("n_new"),
        (
            F.sum(F.when(F.col("is_new"), 1).otherwise(0)).cast("double")
            / F.count("*").cast("double")
        ).alias("new_frac"),
    )


def user_burstiness(positions: DataFrame, min_gaps: int = 2) -> DataFrame:
    """Inter-event burstiness B = (σ−μ)/(σ+μ) per user over hourly
    position gaps (Goh & Barabási): −1 = perfectly regular, 0 =
    Poisson, →1 = bursty. Human mobility is strongly bursty — the
    property that makes naive uniform-rate interpolation wrong and
    motivates the 24 h gap-fill horizon.

    Exact-integer sufficient statistics per user (n, Σg, Σg² as
    BIGINTs off the hour-gap lag), then σ and μ derived with the SAME
    op sequence on both engines: σ = sqrt(n·Σg² − (Σg)²)/n,
    μ = Σg/n, so identical integers give identical doubles. Returns
    (user_id, n_gaps, sum_gap_h, sum_gap_sq, burstiness).
    """
    gaps = (
        positions.withColumn(
            "gap_h",
            F.expr(
                "timestampdiff(HOUR, lag(hour) OVER "
                "(PARTITION BY user_id ORDER BY hour), hour)"
            ),
        )
        .filter(F.col("gap_h").isNotNull())
        .select("user_id", F.col("gap_h").cast("bigint").alias("g"))
    )
    stats = gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.sum("g").alias("sum_gap_h"),
        F.sum(F.col("g") * F.col("g")).alias("sum_gap_sq"),
    ).filter(F.col("n_gaps") >= min_gaps)
    n = F.col("n_gaps").cast("double")
    # factors cast to double BEFORE multiplying (mirrored in the oracle
    # SQL): in int64 the product n*sum_gap_sq wraps silently in Spark
    # but raises in DuckDB, so extreme gap magnitudes would make the
    # engines diverge instead of degrading identically; double-lane
    # products round the same way in both.
    sd = (
        F.sqrt(
            F.col("n_gaps").cast("double") * F.col("sum_gap_sq").cast("double")
            - F.col("sum_gap_h").cast("double")
            * F.col("sum_gap_h").cast("double")
        )
        / n
    )
    mu = F.col("sum_gap_h").cast("double") / n
    return stats.select(
        "user_id",
        "n_gaps",
        "sum_gap_h",
        "sum_gap_sq",
        F.when(sd + mu > 0, (sd - mu) / (sd + mu)).alias("burstiness"),
    )
