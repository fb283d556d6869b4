"""Stream-stream windowed join: cross-micro-batch matching and
batch/stream parity."""

from __future__ import annotations

from conftest import ts

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.streaming.joins import (
    windowed_stream_join,
)

SCHEMA = "user_id long, ts timestamp"

CLICKS_1 = [(1, ts("2024-01-01 10:00:00")), (2, ts("2024-01-01 09:00:00"))]
CLICKS_2 = [(1, ts("2024-01-01 12:00:00"))]
BUYS_1 = [(1, ts("2024-01-01 10:30:00"))]  # within 1h of 10:00 click
BUYS_2 = [
    (1, ts("2024-01-01 12:10:00")),  # within 1h of the LATER click —
    #                                  arrives in a different batch
    (2, ts("2024-01-01 11:00:00")),  # 2h after user 2's click → no match
]


def test_stream_join_matches_batch(spark, tmp_path):
    cdir, bdir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    for rows, path in ((CLICKS_1, cdir), (BUYS_1, bdir)):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)
    for rows, path in ((CLICKS_2, cdir), (BUYS_2, bdir)):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)

    c = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(cdir)
    )
    b = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(bdir)
    )
    q = (
        windowed_stream_join(c, b)
        .writeStream.format("memory")
        .queryName("t_sjoin")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.l_ts, r.r_ts)
            for r in spark.sql("SELECT * FROM t_sjoin").collect()
        }
    finally:
        q.stop()

    expected = {
        (1, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
        (1, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:10:00")),
    }
    assert got == expected

    batch = {
        (r.user_id, r.l_ts, r.r_ts)
        for r in windowed_stream_join(
            spark.read.schema(SCHEMA).parquet(cdir),
            spark.read.schema(SCHEMA).parquet(bdir),
        ).collect()
    }
    assert batch == got
