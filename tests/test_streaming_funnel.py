"""Stateful streaming funnel: batch/stream parity with cross-batch
conversions, and state purge bounds."""

from __future__ import annotations

from conftest import ts

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.funnel import (
    conversion_funnel,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.streaming.funnel import (
    funnel_from_increments,
    make_funnel_fold,
    streaming_funnel_increments,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"

# time-ordered; the u1 conversion SPANS the batch boundary
BATCH_1 = [
    (1, ts("2024-01-01 10:00:00"), 1, "click"),
    (2, ts("2024-01-01 10:10:00"), 2, "click"),
    (3, ts("2024-01-01 10:20:00"), 2, "purchase"),   # u2 converts in-batch
    (4, ts("2024-01-01 11:30:00"), 3, "click"),
]
BATCH_2 = [
    (5, ts("2024-01-01 11:40:00"), 1, "purchase"),   # >1h after u1's click
    (6, ts("2024-01-01 11:50:00"), 3, "purchase"),   # u3 converts cross-batch
    (7, ts("2024-01-02 09:00:00"), 1, "click"),
    (8, ts("2024-01-02 09:30:00"), 1, "purchase"),   # u1 converts day 2
]


def test_stream_matches_batch_with_cross_batch_conversion(spark, tmp_path):
    src = str(tmp_path / "ev")
    for rows in (BATCH_1, BATCH_2):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    all_events = spark.createDataFrame(BATCH_1 + BATCH_2, SCHEMA)
    batch_out = {
        str(r.day): (r.n_from, r.n_converted)
        for r in conversion_funnel(all_events, "click", "purchase", 3600).collect()
    }

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_funnel_increments(stream, "click", "purchase", 3600)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("funnel_inc")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stream_out = {
        str(r.day): (r.n_from, r.n_converted)
        for r in funnel_from_increments(spark.table("funnel_inc")).collect()
    }
    assert stream_out == batch_out
    # the fixture really exercises a cross-batch conversion (u3) and a
    # beyond-horizon non-conversion (u1 day 1)
    assert batch_out["2024-01-01"] == (3, 2)
    assert batch_out["2024-01-02"] == (1, 1)


def test_state_purges_expired_clicks():
    """Clicks whose horizon (plus slack) lies wholly before the max
    seen timestamp must leave the state."""
    import pandas as pd

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    fold = make_funnel_fold("click", "purchase", horizon_s=3600)
    state = FakeState()
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": [pd.Timestamp("2024-01-01 10:00:00"), pd.Timestamp("2024-01-01 20:00:00")],
            "user_id": [1, 1],
            "event_type": ["click", "click"],
        }
    )
    list(fold((1,), iter([pdf]), state))
    ts_us, ids, max_ts = state.value
    # the 10:00 click expired (max seen 20:00 ≫ 11:00); the 20:00 one lives
    assert ids == [2]
    assert max_ts == int(pd.Timestamp("2024-01-01 20:00:00").value // 1000)


def _run_late_fixture(spark, tmp_path, slack_s: int, qname: str):
    """Same-user fixture where the slack setting decides the outcome:
    batch 1 advances THIS user's max_ts to 13:00 (state and purge are
    per user), so without slack the 10:00 click is purged before the
    late 10:30 purchase arrives in batch 2."""
    b1 = [
        (1, ts("2024-01-01 10:00:00"), 1, "click"),
        (2, ts("2024-01-01 13:00:00"), 1, "click"),
    ]
    b2 = [
        (3, ts("2024-01-01 10:30:00"), 1, "purchase"),  # late, in-horizon
    ]
    src = str(tmp_path / f"ev_{qname}")
    for rows in (b1, b2):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_funnel_increments(
            stream, "click", "purchase", 3600, late_slack_s=slack_s
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return {
        str(r.day): (r.n_from, r.n_converted)
        for r in funnel_from_increments(spark.table(qname)).collect()
    }


def test_late_purchase_within_slack_still_converts(spark, tmp_path):
    """An out-of-order purchase (older than the user's max seen ts)
    arriving in a later batch converts a pending click as long as the
    click survived the slack-extended purge — the same graceful
    late-data contract a watermark gives windowed aggs. Without slack
    the click has already purged and the conversion is missed."""
    with_slack = _run_late_fixture(spark, tmp_path, 4 * 3600, "funnel_late_s")
    assert with_slack == {"2024-01-01": (2, 1)}
    no_slack = _run_late_fixture(spark, tmp_path, 0, "funnel_late_ns")
    assert no_slack == {"2024-01-01": (2, 0)}
