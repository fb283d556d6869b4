"""Streaming dedupe within watermark — the streaming mapping of the
reference's batch ``dropDuplicates`` late/dup handling (SURVEY §2.10)."""

from __future__ import annotations

from conftest import ts


def test_drop_duplicates_within_watermark(spark, tmp_path):
    schema = "event_id long, ts timestamp, user_id long"
    rows_b1 = [
        (1, ts("2024-01-01 10:00:00"), 7),
        (1, ts("2024-01-01 10:00:00"), 7),  # dup inside the batch
        (2, ts("2024-01-01 10:05:00"), 8),
    ]
    rows_b2 = [
        (1, ts("2024-01-01 10:00:00"), 7),  # dup across batches
        (3, ts("2024-01-01 10:10:00"), 9),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows_b1, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedupe_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows_b2, schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(r.event_id for r in spark.table("dedupe_test").collect())
    assert got == [1, 2, 3]  # each event id exactly once, across batches
