"""Region-occupancy aggregations.

The reference computes users-per-region-per-hour with a driver-side
loop issuing 744 separate filter+agg jobs (``cal_user_trace.py:30-41``,
one Spark job per hour of the month!). Here it is a single
``groupBy(region, hour)`` — one shuffle, partial+final hash aggregation,
and the hour dimension is just another grouping key (SURVEY.md X1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def occupancy(
    positions: DataFrame,
    region_col: str = "region_id",
    hour_col: str = "hour",
    user_col: str = "user_id",
    scale: float | None = None,
) -> DataFrame:
    """Distinct users per (region, hour) — long-form occupancy table
    (cal_user_trace.py:35-36). ``scale`` applies the sample→population
    factor (24281400/3357267 in the reference, cal_user_trace.py:134-138).
    """
    out = positions.groupBy(region_col, hour_col).agg(
        F.countDistinct(user_col).alias("n_users")
    )
    if scale is not None:
        out = out.withColumn("n_scaled", F.col("n_users") * F.lit(scale))
    return out


def occupancy_approx(
    positions: DataFrame,
    region_col: str = "region_id",
    hour_col: str = "hour",
    user_col: str = "user_id",
    rsd: float = 0.02,
) -> DataFrame:
    """HyperLogLog++ variant for the 100 TB scale path: one pass, no
    per-group distinct shuffle of raw user ids — the exact
    countDistinct above shuffles every (region, hour, user) triple,
    this shuffles fixed-size sketches."""
    return positions.groupBy(region_col, hour_col).agg(
        F.approx_count_distinct(user_col, rsd).alias("n_users_approx")
    )


def record_occupancy(edges: DataFrame) -> DataFrame:
    """Occupancy over gap-filled trajectory edges: record counts per
    (region, hour) — equals user counts because gap-fill guarantees one
    record per user-hour (cal_mobility_matrix.py:153,162-165)."""
    return edges.groupBy("region_id", "hour").agg(F.count("*").alias("n_users"))
