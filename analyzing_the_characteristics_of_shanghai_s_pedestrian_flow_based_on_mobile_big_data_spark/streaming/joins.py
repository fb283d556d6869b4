"""Watermarked stream-stream join — event-to-event attribution.

The remaining Structured Streaming operator class after windowed aggs,
dedupe, stateful OD, and session windows: join two live streams on a
key plus an event-time range (e.g. "purchase within an hour of the
click"). Watermarks on BOTH sides + the time-range predicate are what
make this bounded: each side buffers only rows younger than
(watermark + range), so state is O(recent traffic), not O(stream).

Batch/stream parity is the test contract — the streamed append-mode
result must equal the same join run in batch over the same files
(tests/test_stream_join.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Rows of ``right`` that occur in [left.ts, left.ts + within] for
    the same key. Both inputs may be streaming; each gets a watermark
    so the join state expires. Output columns: key, l_ts, r_ts."""
    l = left.select(
        F.col(key).alias("l_key"), F.col(left_ts).alias("l_ts")
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(key).alias("r_key"), F.col(right_ts).alias("r_ts")
    ).withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"interval {within}"))
    )
    return l.join(r, cond).select(
        F.col("l_key").alias(key), "l_ts", "r_ts"
    )
