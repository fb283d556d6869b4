from __future__ import annotations

from conftest import ts

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.asof import (
    asof_join,
)


def test_asof_attaches_latest_prior_row(spark):
    trades = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:05"), 100.0),
            (1, ts("2024-01-01 10:00:30"), 101.0),
            (2, ts("2024-01-01 10:00:10"), 50.0),
        ],
        "sym long, t_ts timestamp, trade_px double",
    )
    quotes = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 99.5),
            (1, ts("2024-01-01 10:00:20"), 100.5),
            (1, ts("2024-01-01 10:00:30"), 100.9),  # simultaneous → matched
            (2, ts("2024-01-01 10:00:15"), 49.0),  # after the trade → no match
        ],
        "sym long, q_ts timestamp, quote_px double",
    )
    out = asof_join(trades, quotes, "sym", "t_ts", "q_ts", ["quote_px"])
    got = {(r.sym, r.t_ts): r.asof_quote_px for r in out.collect()}
    assert got[(1, ts("2024-01-01 10:00:05"))] == 99.5
    assert got[(1, ts("2024-01-01 10:00:30"))] == 100.9
    assert got[(2, ts("2024-01-01 10:00:10"))] is None
    assert out.count() == trades.count()


def test_asof_matched_row_is_atomic(spark):
    """All asof_* columns must come from the SAME right row: a NULL in
    the latest right row stays NULL — per-column last(ignorenulls)
    would backfill it from an older row, emitting a stitched row that
    never existed."""
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:30"))], "k long, l_ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 1.0, "old"),
            (1, ts("2024-01-01 10:00:20"), None, "new"),
        ],
        "k long, r_ts timestamp, px double, tag string",
    )
    row = asof_join(left, right, "k", "l_ts", "r_ts", ["px", "tag"]).collect()[0]
    assert row.asof_tag == "new"
    assert row.asof_px is None  # NOT backfilled to 1.0


def test_asof_equal_ts_right_rows_deterministic(spark):
    """Multiple right rows at the same (key, ts): the largest payload
    struct wins — a data-determined tiebreak, stable across runs and
    partitionings."""
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:30"))], "k long, l_ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:20"), 5.0),
            (1, ts("2024-01-01 10:00:20"), 7.0),
            (1, ts("2024-01-01 10:00:20"), 6.0),
        ],
        "k long, r_ts timestamp, px double",
    )
    for _ in range(3):
        row = asof_join(left, right, "k", "l_ts", "r_ts", ["px"]).collect()[0]
        assert row.asof_px == 7.0
