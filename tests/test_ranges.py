"""Bucketed interval join: equivalence to the naive range join, left
semantics, and the plan contract (hash join, never nested-loop)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.ranges import (
    bucketed_interval_join,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.plans import (
    physical_plan,
)


def d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


def _points(spark):
    return spark.createDataFrame(
        [(1, d("2024-01-05")), (2, d("2024-02-20")), (3, d("2024-06-01"))],
        "pid long, p_date date",
    )


def _intervals(spark):
    return spark.createDataFrame(
        [
            (10, d("2024-01-01"), d("2024-01-31")),  # covers point 1
            (11, d("2024-01-04"), d("2024-03-01")),  # covers points 1, 2
            (12, d("2024-05-01"), d("2024-05-30")),  # covers nothing
        ],
        "iid long, i_start date, i_end date",
    )


def test_matches_naive_range_join(spark):
    pts, ivs = _points(spark), _intervals(spark)
    for bucket_days in (1, 7, 45):
        got = {
            (r.pid, r.iid)
            for r in bucketed_interval_join(
                pts, ivs, "p_date", "i_start", "i_end", bucket_days
            ).collect()
        }
        naive = {
            (r.pid, r.iid)
            for r in pts.crossJoin(ivs)
            .filter(
                (F.col("p_date") >= F.col("i_start"))
                & (F.col("p_date") <= F.col("i_end"))
            )
            .collect()
        }
        assert got == naive == {(1, 10), (1, 11), (2, 11)}


def test_left_join_keeps_unmatched_points(spark):
    out = bucketed_interval_join(
        _points(spark), _intervals(spark), "p_date", "i_start", "i_end", how="left"
    ).collect()
    by_pid = {}
    for r in out:
        by_pid.setdefault(r.pid, []).append(r.iid)
    assert sorted(by_pid[1]) == [10, 11]
    assert by_pid[3] == [None]  # kept, null interval columns


def test_no_nested_loop_join_in_plan(spark):
    plan = physical_plan(
        bucketed_interval_join(
            _points(spark), _intervals(spark), "p_date", "i_start", "i_end"
        )
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
