"""Branch-complete unit tests for gap_fill_edges — the five
``_add_records`` branches (/root/reference/cal_mobility_matrix.py:105-127)
pinned one by one (SURVEY.md §5.2)."""

from __future__ import annotations

from conftest import ts

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.trajectory import (
    gap_fill_edges,
    hourly_positions,
    keep_latest,
)

import pyspark.sql.functions as F


def _positions(spark, rows):
    return spark.createDataFrame(rows, "user_id long, hour timestamp, region_id int")


def _edges(df):
    return sorted(
        (r.user_id, r.region_id, r.hour.isoformat(), r.pre_hour.isoformat(), r.pre_region_id)
        for r in df.collect()
    )


def test_single_observation_emits_entry_and_closing(spark):
    pos = _positions(spark, [(1, ts("2024-01-01 10:00:00"), 7)])
    got = _edges(gap_fill_edges(pos))
    assert got == sorted(
        [
            # branch 1: entered observation
            (1, 7, "2024-01-01T10:00:00", "2024-01-01T09:00:00", 0),
            # branch 5: left observation one hour later
            (1, 0, "2024-01-01T11:00:00", "2024-01-01T10:00:00", 7),
        ]
    )


def test_contiguous_hours_plain_edges(spark):
    pos = _positions(
        spark,
        [
            (1, ts("2024-01-01 10:00:00"), 7),
            (1, ts("2024-01-01 11:00:00"), 9),
        ],
    )
    got = _edges(gap_fill_edges(pos))
    assert (1, 9, "2024-01-01T11:00:00", "2024-01-01T10:00:00", 7) in got
    assert len(got) == 3  # entry + move + closing


def test_small_gap_forward_fills_previous_region(spark):
    # 10:00 region 7 ... 13:00 region 9: gap of 3 → 11:00 and 12:00
    # filled with region 7, then the move edge at 13:00.
    pos = _positions(
        spark,
        [
            (1, ts("2024-01-01 10:00:00"), 7),
            (1, ts("2024-01-01 13:00:00"), 9),
        ],
    )
    got = _edges(gap_fill_edges(pos))
    assert (1, 7, "2024-01-01T11:00:00", "2024-01-01T10:00:00", 7) in got
    assert (1, 7, "2024-01-01T12:00:00", "2024-01-01T11:00:00", 7) in got
    assert (1, 9, "2024-01-01T13:00:00", "2024-01-01T12:00:00", 7) in got


def test_exactly_24h_gap_still_fills(spark):
    pos = _positions(
        spark,
        [
            (1, ts("2024-01-01 00:00:00"), 7),
            (1, ts("2024-01-02 00:00:00"), 9),
        ],
    )
    filled = gap_fill_edges(pos)
    # 23 interior fills + entry + move + closing
    assert filled.count() == 23 + 3


def test_large_gap_emits_sentinels_not_fills(spark):
    pos = _positions(
        spark,
        [
            (1, ts("2024-01-01 00:00:00"), 7),
            (1, ts("2024-01-03 00:00:00"), 9),  # 48h gap
        ],
    )
    got = _edges(gap_fill_edges(pos))
    # left observation at pre_hour+1, re-entered at hour from sentinel 0
    assert (1, 0, "2024-01-01T01:00:00", "2024-01-01T00:00:00", 7) in got
    assert (1, 9, "2024-01-03T00:00:00", "2024-01-02T23:00:00", 0) in got
    assert len(got) == 4  # entry + the two sentinel edges + closing


def test_trajectory_is_hourly_contiguous_within_fill(spark):
    """Property: for gaps ≤ 24 the filled trajectory covers every hour."""
    pos = _positions(
        spark,
        [
            (1, ts("2024-01-01 05:00:00"), 3),
            (1, ts("2024-01-01 17:00:00"), 4),
            (1, ts("2024-01-01 18:00:00"), 5),
        ],
    )
    hours = sorted(r.hour for r in gap_fill_edges(pos).collect())
    expect = [ts("2024-01-01 05:00:00")]
    expect += [ts(f"2024-01-01 {h:02d}:00:00") for h in range(6, 20)]
    assert hours == expect


def test_keep_latest_deterministic(spark):
    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:10:00"), 5, 100),
            (1, ts("2024-01-01 10:50:00"), 6, 101),
            (1, ts("2024-01-01 10:50:00"), 7, 102),  # ts tie → higher id wins
        ],
        "user_id long, ts timestamp, region_id int, event_id long",
    )
    pos = hourly_positions(df)
    rows = pos.collect()
    assert len(rows) == 1 and rows[0].region_id == 7


def test_keep_latest_one_row_per_key(spark):
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (2, 1, "c")], "k long, o long, v string"
    )
    out = keep_latest(df, ["k"], [F.col("o").desc()]).collect()
    assert {(r.k, r.v) for r in out} == {(1, "b"), (2, "c")}


def test_gap_outliers_reports_only_oversized_gaps(spark, tmp_path):
    """get_more_24 parity (cal_mobility_matrix.py:92-93): only hops
    whose gap exceeds the fill horizon appear, with the lag context
    attached — plus the reference's single-file CSV report sink (S9,
    coalesce(1) instead of its repartition(1): no extra shuffle)."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.trajectory import (
        gap_outliers,
    )

    pos = _positions(
        spark,
        [
            (1, ts("2024-01-01 10:00:00"), 7),
            (1, ts("2024-01-01 12:00:00"), 8),   # gap 2 — fillable
            (1, ts("2024-01-03 00:00:00"), 9),   # gap 36 — outlier
            (2, ts("2024-01-01 00:00:00"), 3),
            (2, ts("2024-01-02 00:00:00"), 4),   # gap 24 — still fillable
        ],
    )
    out = gap_outliers(pos)
    rows = [tuple(r) for r in out.collect()]
    assert rows == [
        (1, 9, ts("2024-01-03 00:00:00"), ts("2024-01-01 12:00:00"), 8, 36)
    ]

    # S9 report sink: one header CSV file, reloadable
    dest = str(tmp_path / "more_24_csv")
    out.coalesce(1).write.option("header", True).mode("overwrite").csv(dest)
    back = spark.read.option("header", True).csv(dest)
    assert back.count() == 1
    assert set(back.columns) == {
        "user_id", "region_id", "hour", "pre_hour", "pre_region_id", "gap_h",
    }


def test_gap_outliers_threshold_is_exclusive(spark):
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.trajectory import (
        gap_outliers,
    )

    pos = _positions(
        spark,
        [
            (1, ts("2024-01-01 00:00:00"), 1),
            (1, ts("2024-01-01 05:00:00"), 2),  # gap 5
        ],
    )
    assert gap_outliers(pos, max_fill_hours=5).count() == 0
    assert gap_outliers(pos, max_fill_hours=4).count() == 1
