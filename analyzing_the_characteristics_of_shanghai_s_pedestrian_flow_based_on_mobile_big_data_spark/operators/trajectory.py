"""Trajectory operators: hourly dedupe, lag/lead context, gap-fill.

This module re-expresses the reference's RDD ``flatMap(_add_records)``
record expansion (``cal_mobility_matrix.py:58,87,105-127``;
``cal_subarea_portion.py:233,241-263``) as a single Catalyst-native
``explode(CASE … sequence …)`` — no python workers, no per-row pickling,
whole-stage codegen end to end. On a cluster this turns the most
expensive stage of the reference (every row through a python lambda)
into a JVM generator expression.

Semantics reproduced exactly (five branches of ``_add_records``,
cal_mobility_matrix.py:105-127), with the string sentinel ``'0'``
replaced by integer region 0:

1. first observation of a user  → emit (region, hour) with
   pre_region = 0 (entered observation);
2. gap of exactly 1 hour        → plain transition edge;
3. 1 < gap ≤ 24 hours           → forward-fill: user assumed to stay in
   the previous region for the in-between hours, then move;
4. gap > 24 hours               → out-of-observation: sentinel region 0
   at pre_hour+1, re-entry edge 0→region at `hour`;
5. last observation of a user   → closing edge region→0 at hour+1.

Every emitted row is ``(user, region, hour, pre_hour, pre_region)``:
simultaneously an occupancy record (user is in `region` at `hour`) and
an OD edge (`pre_region` → `region` entering `hour`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_latest(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """Deterministic dedupe-keep-first: one row per `keys`, picking the
    first row under `order_by` (W1/U3 — cal_mobility_matrix.py:68-69).

    Unlike the reference's ``dropDuplicates`` (arbitrary survivor), the
    survivor here is defined by an explicit ordering, so results are
    stable across runs/partitionings — a correctness requirement for
    oracle-differential testing and for any incremental recompute.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def hourly_positions(
    pings: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    region_col: str = "region_id",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """One (user, hour, region) per user-hour: the latest ping in the
    hour wins (cal_mobility_matrix.py:66-69 ``cal_full_records_max``),
    with an explicit id tiebreak for equal timestamps."""
    # max_by aggregate, not a row_number window: the groupBy gets
    # map-side partial aggregation, so each executor pre-collapses its
    # pings to one candidate per (user, hour) before the shuffle — at
    # 100 TB that shuffles ~one row per user-hour instead of every
    # ping. (Equivalent to row_number()=1 over ts DESC, id DESC, made
    # deterministic by the (ts, id) struct ordering.)
    order = (
        F.struct(F.col(ts_col), F.col(tiebreak_col))
        if tiebreak_col is not None
        else F.col(ts_col)
    )
    return (
        pings.withColumn("hour", F.date_trunc("hour", F.col(ts_col)))
        .groupBy(F.col(user_col).alias("user_id"), F.col("hour"))
        .agg(F.max_by(F.col(region_col), order).alias("region_id"))
    )


def gap_outliers(
    positions: DataFrame,
    max_fill_hours: int = 24,
) -> DataFrame:
    """QA report: trajectory hops whose hour gap exceeds the fill
    horizon (the reference's ``get_more_24`` —
    ``cal_mobility_matrix.py:92-93`` dumps ``hour_diff > 24`` rows to a
    single-file CSV so an operator can eyeball out-of-observation
    users before trusting the month's OD matrix).

    Input: one row per (user_id, hour, region_id) — from
    :func:`hourly_positions`.
    Output: (user_id, region_id, hour, pre_hour, pre_region_id, gap_h)
    for every hop with ``gap_h > max_fill_hours``.

    One window shuffle (hash by user), then a plain filter — the same
    lag context :func:`gap_fill_edges` computes, so at 100 TB the two
    can share one pass when run together. The result is tiny by
    construction (only broken trajectories), so a coalesced
    single-file CSV sink (S9) on top is safe.
    """
    w = Window.partitionBy("user_id").orderBy("hour")
    return (
        positions.withColumn("pre_hour", F.lag("hour").over(w))
        .withColumn("pre_region_id", F.lag("region_id").over(w))
        .withColumn("gap_h", F.expr("timestampdiff(HOUR, pre_hour, hour)"))
        .filter(F.col("gap_h") > max_fill_hours)
        .select(
            "user_id", "region_id", "hour", "pre_hour", "pre_region_id", "gap_h"
        )
    )


def gap_fill_edges(
    positions: DataFrame,
    max_fill_hours: int = 24,
    sentinel_region: int = 0,
) -> DataFrame:
    """Expand hourly positions into a complete trajectory-edge table.

    Input: one row per (user_id, hour, region_id) — from
    :func:`hourly_positions`.
    Output: (user_id, region_id, hour, pre_hour, pre_region_id), one row
    per occupied hour plus sentinel rows, per the five branches above.

    Implementation: two window columns (lag/lead), then ONE
    ``explode(sequence)`` of the hours each input row is responsible
    for, with the output fields derived by plain CASE expressions on
    the exploded hour. No struct-array building, no higher-order
    lambdas — Spark's lambda functions run interpreted, outside
    whole-stage codegen; this formulation keeps the entire expansion
    inside codegen. The only shuffle is the window's hash partition by
    user; the expansion itself is pipelined. At 100 TB the expansion
    factor is bounded by ``max_fill_hours``.
    """
    w = Window.partitionBy("user_id").orderBy("hour")
    ctx = (
        positions.withColumn("pre_hour", F.lag("hour").over(w))
        .withColumn("pre_region_id", F.lag("region_id").over(w))
        .withColumn("next_hour", F.lead("hour").over(w))
        .withColumn("gap", F.expr("timestampdiff(HOUR, pre_hour, hour)"))
    )

    sent = F.lit(sentinel_region)
    hour = F.col("hour")
    pre_hour = F.col("pre_hour")
    region = F.col("region_id")
    pre_region = F.col("pre_region_id")
    one_h = F.expr("INTERVAL 1 HOUR")
    gap = F.col("gap")

    # Hours this input row must emit:
    #  - first observation: just `hour`;
    #  - fillable gap (incl. gap=1): every hour in (pre_hour, hour];
    #  - oversized gap: the leave-observation hour and `hour`;
    #  plus, for the user's last row, the closing hour+1.
    base_hours = (
        F.when(pre_hour.isNull(), F.array(hour))
        .when(
            gap <= max_fill_hours,
            F.sequence(pre_hour + one_h, hour, one_h),
        )
        .otherwise(F.array(pre_hour + one_h, hour))
    )
    all_hours = F.when(
        F.col("next_hour").isNull(),
        F.concat(base_hours, F.array(hour + one_h)),
    ).otherwise(base_hours)

    e = ctx.select(
        "user_id",
        region.alias("cur_region"),
        pre_region.alias("prev_region"),
        hour.alias("cur_hour"),
        pre_hour.alias("prev_hour"),
        gap.alias("gap"),
        pre_hour.isNull().alias("is_first"),
        F.explode(all_hours).alias("hour"),
    )
    h = F.col("hour")
    cur_hour = F.col("cur_hour")
    prev_hour = F.col("prev_hour")
    cur_region = F.col("cur_region")
    prev_region = F.col("prev_region")
    g = F.col("gap")
    oversized = (~F.col("is_first")) & (g > max_fill_hours)

    region_out = (
        F.when(h > cur_hour, sent)  # closing sentinel row
        .when(oversized & (h < cur_hour), sent)  # left observation
        .when(h < cur_hour, prev_region)  # interior fill
        .otherwise(cur_region)  # the observed hour itself
    )
    pre_region_out = (
        F.when(h > cur_hour, cur_region)  # closing: came from cur_region
        .when((h == cur_hour) & (F.col("is_first") | oversized), sent)
        .otherwise(prev_region)
    )
    pre_hour_out = F.when(oversized & (h < cur_hour), prev_hour).otherwise(
        h - one_h
    )

    return e.select(
        "user_id",
        region_out.cast("int").alias("region_id"),
        h.alias("hour"),
        pre_hour_out.alias("pre_hour"),
        pre_region_out.cast("int").alias("pre_region_id"),
    )
