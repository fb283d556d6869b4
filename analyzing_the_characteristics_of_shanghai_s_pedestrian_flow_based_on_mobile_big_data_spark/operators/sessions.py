"""Sessionization — gap-threshold session ids per user.

Not in the reference (its 1-hour buckets are fixed tumbling windows via
``date_trunc``, SURVEY.md F1), but a core log-analytics capability the
north star requires. Classic two-window formulation: lag(ts) → flag
gap > threshold → running sum of flags = session index. Both windows
partition by the same key, so Catalyst plans ONE shuffle (the second
window reuses the first's partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Adds ``session_id`` (per-user 1-based index) to each row."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_s = gap_minutes * 60
    is_new = (
        F.when(F.lag(ts_col).over(w).isNull(), 1)
        .when(
            F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
            > gap_s,
            1,
        )
        .otherwise(0)
    )
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )


def session_stats(
    sessions: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Per-session summary: span seconds, event count, first/last ts."""
    return sessions.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("span_s"),
    )
