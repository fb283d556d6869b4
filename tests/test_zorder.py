"""Morton key math, grid binning, and the z-order layout pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.functions.zorder import (
    cluster_by_zorder,
    grid_cell,
    morton_key,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.plans import (
    physical_plan,
)


def _interleave_py(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_key_matches_reference_interleave(spark):
    rows = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 99, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", morton_key(F.col("x"), F.col("y"), bits=8)
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _interleave_py(x, y, 8), (x, y)


def test_grid_cell_bins_and_clamps(spark):
    df = spark.createDataFrame(
        [(30.4,), (30.5,), (31.49,), (32.49,), (33.0,)], "lat double"
    )
    got = [
        r.c
        for r in df.select(
            grid_cell(F.col("lat"), 30.5, 32.5, 256).alias("c")
        ).collect()
    ]
    assert got[0] == 0  # below range clamps to 0
    assert got[1] == 0
    assert got[-1] == 255  # above range clamps to top cell
    assert 0 < got[2] < got[3] <= 255


def test_cluster_by_zorder_layout(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 317).alias("x"), (F.col("id") % 251).alias("y")
    )
    out = cluster_by_zorder(
        df, morton_key(F.col("x"), F.col("y"), bits=9), num_files=8
    )
    plan = physical_plan(out)
    assert "rangepartitioning" in plan.lower()  # balanced file split
    assert "Sort" in plan
    # key intervals of different partitions must not overlap: that is
    # the property that makes parquet min/max stats prune
    parts = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("__zkey").alias("lo"), F.max("__zkey").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for prev, cur in zip(parts, parts[1:]):
        assert prev.hi <= cur.lo
