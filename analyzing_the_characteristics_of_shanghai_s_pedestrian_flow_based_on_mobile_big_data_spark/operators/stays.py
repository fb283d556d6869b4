"""Stay segmentation — consecutive-hour runs in one region.

The pedestrian-flow product the reference never quite materializes
(its occupancy counts *presences*, not *visits*): collapse each user's
hourly trajectory into stay segments (user, region, stay_start,
stay_end, n_hours). Classic gaps-and-islands: two row_numbers whose
difference is constant within a run — pure window algebra, one shuffle
by user, no python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stay_segments(positions: DataFrame) -> DataFrame:
    """(user_id, hour, region_id) → one row per contiguous stay.

    A stay breaks when the region changes OR an hour is missing (use
    gap-filled positions for the reference's assume-stayed semantics).
    """
    w_reg = Window.partitionBy("user_id", "region_id").orderBy("hour")
    # hours-since-epoch makes the island key robust to missing hours
    hour_idx = (F.unix_timestamp("hour") / 3600).cast("long")
    marked = positions.withColumn(
        "__island",
        hour_idx - F.row_number().over(w_reg),
    )
    return (
        marked.groupBy("user_id", "region_id", "__island")
        .agg(
            F.min("hour").alias("stay_start"),
            F.max("hour").alias("stay_end"),
            F.count("*").alias("n_hours"),
        )
        .drop("__island")
    )


def dwell_stats(stays: DataFrame) -> DataFrame:
    """Per-region visit statistics: number of stays and average stay
    length in hours (exact int/count division — oracle-stable)."""
    return stays.groupBy("region_id").agg(
        F.count("*").alias("n_stays"),
        (F.sum("n_hours").cast("double") / F.count("*")).alias("avg_stay_h"),
        F.max("n_hours").alias("max_stay_h"),
    )
