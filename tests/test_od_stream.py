"""Stateful streaming OD edges must match the batch lag() computation,
with state carrying positions across micro-batch boundaries."""

from __future__ import annotations

from conftest import ts

import pyspark.sql.functions as F
from pyspark.sql import Window

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.streaming.od_stream import (
    run_od_stream_over_dir,
)

POSITIONS = [
    # user 1 moves 5 → 6 → 6; user 2 appears once in batch 1, again in batch 2
    (1, ts("2024-01-01 10:00:00"), 5),
    (1, ts("2024-01-01 11:00:00"), 6),
    (2, ts("2024-01-01 10:00:00"), 3),
    # --- batch boundary ---
    (1, ts("2024-01-01 13:00:00"), 6),
    (2, ts("2024-01-01 11:00:00"), 4),
]


def test_streaming_edges_match_batch_lag(spark, tmp_path):
    schema = "user_id long, hour timestamp, region_id int"
    pos_dir = str(tmp_path / "positions")
    # two files → two micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame(POSITIONS[:3], schema).coalesce(1).write.mode(
        "append"
    ).parquet(pos_dir)
    q = run_od_stream_over_dir(
        spark, pos_dir, "od_edges_test", str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(POSITIONS[3:], schema).coalesce(1).write.mode(
            "append"
        ).parquet(pos_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.user_id, r.hour, r.pre_hour, r.region_id, r.pre_region_id)
        for r in spark.table("od_edges_test").collect()
    }

    batch = spark.createDataFrame(POSITIONS, schema)
    w = Window.partitionBy("user_id").orderBy("hour")
    expect = {
        (r.user_id, r.hour, r.pre_hour, r.region_id, r.pre_region_id)
        for r in batch.withColumn("pre_hour", F.lag("hour").over(w))
        .withColumn("pre_region_id", F.lag("region_id").over(w))
        .filter(F.col("pre_hour").isNotNull())
        .select("user_id", "hour", "pre_hour", "region_id", "pre_region_id")
        .collect()
    }
    assert got == expect
    # the cross-batch edge (user 2: batch1 pos → batch2 pos) proves state
    assert (2, ts("2024-01-01 11:00:00"), ts("2024-01-01 10:00:00"), 4, 3) in got


def test_streaming_gap_outliers_match_batch(spark, tmp_path):
    """The live get_more_24 twin: a >24h gap closing in micro-batch 2
    surfaces exactly the batch gap_outliers row (same columns, same
    gap_h), and fillable gaps never appear."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.trajectory import (
        gap_outliers,
    )
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.streaming.od_stream import (
        run_gap_outlier_stream_over_dir,
    )

    rows_b1 = [
        (1, ts("2024-01-01 10:00:00"), 5),
        (1, ts("2024-01-01 12:00:00"), 6),   # gap 2 — fillable
        (2, ts("2024-01-01 09:00:00"), 3),
    ]
    rows_b2 = [
        (1, ts("2024-01-03 00:00:00"), 7),   # gap 36 — outlier, crosses batches
        (2, ts("2024-01-01 10:00:00"), 4),   # gap 1
    ]
    schema = "user_id long, hour timestamp, region_id int"
    pos_dir = str(tmp_path / "positions")
    spark.createDataFrame(rows_b1, schema).coalesce(1).write.mode("append").parquet(pos_dir)
    q = run_gap_outlier_stream_over_dir(
        spark, pos_dir, "gap_outliers_test", str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows_b2, schema).coalesce(1).write.mode("append").parquet(pos_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        tuple(r)
        for r in spark.table("gap_outliers_test").collect()
    }
    expect = {
        tuple(r)
        for r in gap_outliers(
            spark.createDataFrame(rows_b1 + rows_b2, schema)
        ).collect()
    }
    assert got == expect
    assert len(got) == 1  # exactly the 36h hop
