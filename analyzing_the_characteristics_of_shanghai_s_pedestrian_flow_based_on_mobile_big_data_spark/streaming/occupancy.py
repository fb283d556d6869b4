"""Structured-Streaming occupancy (SURVEY.md §2.10 mapping).

The reference simulates hourly windows with ``date_trunc`` over a
static month (batch). The streaming-native version: tumbling
``F.window(ts, '1 hour')`` + watermark for late pings, running over the
same events source. For tests/local runs the parquet directory drives
the stream to completion synchronously (memory sink +
``processAllAvailable``); in production the source line swaps for
kafka and the sink for a parquet/foreachBatch upsert of the long-form
occupancy table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

# File-stream schema: the testdata's parquet stores nanosecond
# timestamps, which Spark only reads as LONG (legacy nanosAsLong) —
# declare LONG here and convert to a real timestamp in the stream.
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def streaming_occupancy(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "2 hours",
    query_name: str = "stream_occupancy",
) -> DataFrame:
    """Run a tumbling-1h occupancy aggregation over `events` as a
    stream; returns the fully-materialized result as a batch DataFrame.

    Complete output mode so every window is present when the (finite)
    source drains — the batch-equivalent contract the oracle checks.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    )
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name).select(
        F.col("win.start").alias("hour"), "event_type", "n_events"
    )
