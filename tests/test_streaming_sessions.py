"""Streaming session windows: gap merge across micro-batches and
batch/stream parity."""

from __future__ import annotations

from conftest import ts

from pyspark.sql import functions as F

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.streaming.sessions import (
    run_session_stream_to_memory,
)

SCHEMA = "user_id long, ts timestamp"

# user 1: two events 10 min apart (one session), then a 40-min gap
# (new session). user 2: single event. The second file's 10:05 event
# arrives in a later micro-batch but merges into user 1's first
# session — the stateful window merge under test.
FILE_1 = [
    (1, ts("2024-01-01 10:00:00")),
    (1, ts("2024-01-01 10:10:00")),
    (2, ts("2024-01-01 09:00:00")),
]
FILE_2 = [
    (1, ts("2024-01-01 10:05:00")),  # merges into session 1 (late-ish)
    (1, ts("2024-01-01 10:50:00")),  # 40 min after 10:10 → new session
]


def test_streaming_sessions_merge_and_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(FILE_1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(FILE_2, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    q = run_session_stream_to_memory(
        spark, src, SCHEMA, query_name="t_sessions"
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.session_start): r.n_events
            for r in spark.sql("SELECT * FROM t_sessions").collect()
        }
    finally:
        q.stop()

    assert got == {
        (1, ts("2024-01-01 10:00:00")): 3,  # 10:00, 10:05, 10:10 merged
        (1, ts("2024-01-01 10:50:00")): 1,
        (2, ts("2024-01-01 09:00:00")): 1,
    }

    # batch/stream parity over the same files
    batch = {
        (r.user_id, r.session_start): r.n_events
        for r in (
            spark.read.schema(SCHEMA)
            .parquet(src)
            .groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.col("session_window.start").alias("session_start"),
                "n_events",
            )
            .collect()
        )
    }
    assert batch == got
