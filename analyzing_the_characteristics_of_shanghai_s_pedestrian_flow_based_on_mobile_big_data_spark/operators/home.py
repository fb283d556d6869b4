"""Home-location ("start region") detection.

The reference loops over 29 nights, issuing one job per night and
left-joining 29 result columns onto a user list, then computes the
per-user mode **on the driver** over collected rows
(``cal_user_trace.py:50-97``). Here the whole computation is one
distributed pass: assign night ids, pick each night's anchor region,
mode across nights — three shuffles total regardless of how many
nights the data spans (SURVEY.md X2/A6).

Determinism fixes over the reference (documented divergences):
- the per-night anchor is the *earliest* night observation
  (``min_by``-style row_number over ts asc) instead of Spark's
  order-dependent ``first()`` (cal_user_trace.py:122);
- mode ties break to the smallest region id instead of python dict
  iteration order (cal_user_trace.py:75-82).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def night_positions(
    pings: DataFrame,
    ts_col: str = "ts",
    night_start: int = 19,
    night_end: int = 8,
) -> DataFrame:
    """Rows in the night window [night_start, 24) ∪ [0, night_end],
    tagged with the night they belong to (evening hours anchor the
    night to their own date; small hours to the previous date) —
    reference night filter at cal_user_trace.py:131-132."""
    h = F.hour(F.col(ts_col))
    in_night = (h >= night_start) | (h <= night_end)
    night_date = F.when(
        h <= night_end, F.date_sub(F.to_date(F.col(ts_col)), 1)
    ).otherwise(F.to_date(F.col(ts_col)))
    return pings.filter(in_night).withColumn("night", night_date)


def night_anchor(
    nights: DataFrame,
    user_col: str = "user_id",
    region_col: str = "region_id",
    ts_col: str = "ts",
) -> DataFrame:
    """First-observed region per (user, night) — the reference's
    "start region" (cal_user_trace.py:55-61), made deterministic."""
    w = Window.partitionBy(user_col, "night").orderBy(
        F.col(ts_col).asc(), F.col(region_col).asc()
    )
    return (
        nights.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(user_col, "night", region_col)
    )


def mode_per_group(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Most frequent value per group, ties → smallest value (A6).
    groupBy + window row_number: two shuffles, no driver collect."""
    counted = df.groupBy(group_col, value_col).agg(F.count("*").alias("__n"))
    w = Window.partitionBy(group_col).orderBy(
        F.col("__n").desc(), F.col(value_col).asc()
    )
    return (
        counted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(group_col, value_col)
    )


def home_location(
    pings: DataFrame,
    user_col: str = "user_id",
    region_col: str = "region_id",
    ts_col: str = "ts",
    night_start: int = 19,
    night_end: int = 8,
) -> DataFrame:
    """(user_id, home_region): modal per-night anchor region
    (cal_user_trace.py:50-97 collapsed into one distributed pass)."""
    anchors = night_anchor(
        night_positions(pings, ts_col, night_start, night_end),
        user_col,
        region_col,
        ts_col,
    )
    return mode_per_group(anchors, user_col, region_col).withColumnRenamed(
        region_col, "home_region"
    )


def night_single_region_users(
    pings: DataFrame,
    user_col: str = "user_id",
    region_col: str = "region_id",
    ts_col: str = "ts",
    night_start: int = 19,
    night_end: int = 8,
) -> DataFrame:
    """Users observed in exactly one region across all nights —
    countDistinct + HAVING (cal_user_trace.py:121-122, P12/A3)."""
    nights = night_positions(pings, ts_col, night_start, night_end)
    return (
        nights.groupBy(user_col)
        .agg(F.countDistinct(region_col).alias("n_regions"))
        .filter(F.col("n_regions") == 1)
        .select(user_col, "n_regions")
    )
