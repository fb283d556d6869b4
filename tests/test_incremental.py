from __future__ import annotations

from conftest import ts

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.streaming.incremental import (
    IncrementalCountTable,
    incremental_occupancy_stream,
)

ROWS_B1 = [
    (1, ts("2024-01-01 10:00:00"), 5),
    (2, ts("2024-01-01 10:00:00"), 5),
    (1, ts("2024-01-01 11:00:00"), 6),
]
ROWS_B2 = [
    (3, ts("2024-01-01 10:00:00"), 5),  # adds to existing (5, 10:00)
    (1, ts("2024-01-01 12:00:00"), 6),
]


def test_foreachbatch_incremental_counts(spark, tmp_path):
    schema = "user_id long, hour timestamp, region_id int"
    src = str(tmp_path / "src")
    spark.createDataFrame(ROWS_B1, schema).coalesce(1).write.mode("append").parquet(src)
    q = incremental_occupancy_stream(
        spark, src, str(tmp_path / "table"), str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(ROWS_B2, schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    table = IncrementalCountTable(
        spark, str(tmp_path / "table"), ["region_id", "hour"]
    )
    got = {(r.region_id, r.hour): r.cnt for r in table.read().collect()}
    assert got == {
        (5, ts("2024-01-01 10:00:00")): 3,  # 2 from batch 1 + 1 from batch 2
        (6, ts("2024-01-01 11:00:00")): 1,
        (6, ts("2024-01-01 12:00:00")): 1,
    }
