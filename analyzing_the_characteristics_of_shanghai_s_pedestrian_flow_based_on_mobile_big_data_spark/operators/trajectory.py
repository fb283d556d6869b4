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

    Implementation: two window columns (lag/lead), then one generator
    expression per row — ``explode`` of a CASE-selected struct array
    built with ``sequence``/``transform``. The only shuffle is the
    window's hash partition by user; the expansion itself is pipelined.
    At 100 TB the expansion factor is bounded by ``max_fill_hours``.
    """
    w = Window.partitionBy("user_id").orderBy("hour")
    ctx = (
        positions.withColumn("pre_hour", F.lag("hour").over(w))
        .withColumn("pre_region_id", F.lag("region_id").over(w))
        .withColumn("next_hour", F.lead("hour").over(w))
        .withColumn(
            "gap", F.expr("timestampdiff(HOUR, pre_hour, hour)")
        )
    )

    sent = F.lit(sentinel_region)

    def edge(region, hour, pre_hour, pre_region) -> Column:
        return F.struct(
            region.cast("int").alias("region_id"),
            hour.alias("hour"),
            pre_hour.alias("pre_hour"),
            pre_region.cast("int").alias("pre_region_id"),
        )

    hour = F.col("hour")
    pre_hour = F.col("pre_hour")
    region = F.col("region_id")
    pre_region = F.col("pre_region_id")
    one_h = F.expr("INTERVAL 1 HOUR")

    # Branch 1: first observation — entered-observation edge 0 → region.
    first_rows = F.array(edge(region, hour, hour - one_h, sent))
    # Branch 2: contiguous hours — plain edge.
    plain_rows = F.array(edge(region, hour, pre_hour, pre_region))
    # Branch 3: fillable gap — stay in pre_region for the interior
    # hours, then move (cal_mobility_matrix.py:116-120).
    filled_rows = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.col("gap") - 1),
            lambda i: edge(
                pre_region,
                pre_hour + F.make_interval(hours=i),
                pre_hour + F.make_interval(hours=i - 1),
                pre_region,
            ),
        ),
        F.array(edge(region, hour, hour - one_h, pre_region)),
    )
    # Branch 4: gap too large — leave observation at pre_hour+1, re-enter
    # at hour (cal_mobility_matrix.py:121-124).
    out_rows = F.array(
        edge(sent, pre_hour + one_h, pre_hour, pre_region),
        edge(region, hour, hour - one_h, sent),
    )
    # Branch 5 suffix: last observation — closing edge region → 0 at
    # hour+1 (cal_mobility_matrix.py:125-127).
    rows = (
        F.when(pre_hour.isNull(), first_rows)
        .when(F.col("gap") <= 1, plain_rows)
        .when(F.col("gap") <= max_fill_hours, filled_rows)
        .otherwise(out_rows)
    )
    empty = F.slice(first_rows, 1, 0)  # typed empty array<struct>
    closing = F.when(
        F.col("next_hour").isNull(),
        F.array(edge(sent, hour + one_h, hour, region)),
    ).otherwise(empty)

    return (
        ctx.select("user_id", F.explode(F.concat(rows, closing)).alias("e"))
        .select(
            "user_id",
            F.col("e.region_id").alias("region_id"),
            F.col("e.hour").alias("hour"),
            F.col("e.pre_hour").alias("pre_hour"),
            F.col("e.pre_region_id").alias("pre_region_id"),
        )
    )
