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

# File streams need a declared schema (no inference). The generator's
# timestamp encoding has varied across rounds (nanosecond INT64 vs
# TIMESTAMP(MICROS) NTZ), so derive the stream schema from the batch
# footer at call time instead of hardcoding one — see
# _events_stream_source.


def _events_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the ts column
    normalized to a session-tz TIMESTAMP, whatever the file's physical
    encoding. One footer read (batch schema) decides the conversion —
    the same three-way rule as sources.tables.load_events."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    dt = dict(src.dtypes).get("ts")
    if dt == "bigint":
        src = src.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif dt == "timestamp_ntz":
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    return src


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
    src = _events_stream_source(spark, sf_dir)
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
