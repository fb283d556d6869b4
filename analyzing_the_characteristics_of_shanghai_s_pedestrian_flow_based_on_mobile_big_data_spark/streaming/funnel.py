"""Stateful streaming conversion funnel — cross-batch A→B matching.

The batch funnel (operators/funnel.py) sees the whole event log at
once; the streaming version must convert a click from micro-batch 1
with a purchase arriving in micro-batch 7. ``applyInPandasWithState``
keyed by user carries the OPEN clicks (those whose horizon has not
expired and that no purchase has matched yet) across batches:

- a ``from_type`` event emits a (day, from_inc=1, conv_inc=0) row
  immediately and joins the pending list;
- a ``to_type`` event at (ts, id) converts every pending click c with
  (c_ts, c_id) <= (ts, id) lexicographically and ts <= c_ts + horizon
  — the identical at-or-after + horizon contract as the batch
  operator's descending-window formulation — emitting one
  (day-of-click, 0, 1) row per conversion and removing the click
  (a click converts at most once, on its earliest matching purchase);
- pending clicks whose horizon lies wholly before the group's max
  seen timestamp can never match a future event of an in-order
  stream, so they purge (bounding state at O(clicks per horizon) per
  user, not O(stream)).

Increments aggregate downstream (groupBy(day).sum — map-combinable),
so the operator's output is append-mode friendly. Batch/stream parity
on an in-order file stream is the test contract
(tests/test_streaming_funnel.py); out-of-order slack is the
``late_slack_s`` parameter, which delays purging by the same margin a
watermark would.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

INC_SCHEMA = T.StructType(
    [
        T.StructField("day", T.DateType()),
        T.StructField("from_inc", T.LongType()),
        T.StructField("conv_inc", T.LongType()),
    ]
)

# open clicks: parallel arrays (event-time µs, event id), plus the max
# event-time µs this group has seen (drives the purge horizon)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("click_ts_us", T.ArrayType(T.LongType())),
        T.StructField("click_ids", T.ArrayType(T.LongType())),
        T.StructField("max_ts_us", T.LongType()),
    ]
)


def make_funnel_fold(
    from_type: str, to_type: str, horizon_s: int, late_slack_s: int = 0
):
    """Build the per-user state fold for
    ``groupBy(user).applyInPandasWithState``."""
    horizon_us = horizon_s * 1_000_000
    slack_us = late_slack_s * 1_000_000

    def fold(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts_us, ids, max_ts = state.get
            pending = list(zip(ts_us, ids))
        else:
            pending, max_ts = [], None
        pdf = pd.concat(list(batches), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        out: list[tuple] = []
        for _, r in pdf.iterrows():
            ts = r["ts"]
            ts_u = int(ts.value // 1000)  # pandas ns → µs
            eid = int(r["event_id"])
            etype = r["event_type"]
            if etype == from_type:
                out.append((ts.date(), 1, 0))
                pending.append((ts_u, eid))
            elif etype == to_type:
                still = []
                for c_ts, c_id in pending:
                    if (c_ts, c_id) <= (ts_u, eid) and ts_u - c_ts <= horizon_us:
                        out.append(
                            (pd.Timestamp(c_ts * 1000).date(), 0, 1)
                        )
                    else:
                        still.append((c_ts, c_id))
                pending = still
            max_ts = ts_u if max_ts is None else max(max_ts, ts_u)
        if max_ts is not None:
            pending = [
                (c_ts, c_id)
                for c_ts, c_id in pending
                if c_ts + horizon_us + slack_us >= max_ts
            ]
        if pending:
            state.update(
                (
                    [c for c, _ in pending],
                    [i for _, i in pending],
                    max_ts,
                )
            )
        elif state.exists:
            # No open clicks → no reason to hold a state-store entry:
            # total state stays bounded by users-with-pending-clicks
            # (horizon-windowed), not by every user ever seen on an
            # unbounded stream. Trade-off: the user's max_ts is
            # re-seeded from their next batch, so a beyond-horizon late
            # click that the retained high-water mark would have purged
            # immediately can briefly re-open — within the same
            # best-effort contract the late_slack_s purge already
            # defines for late data.
            state.remove()
        yield pd.DataFrame(out, columns=["day", "from_inc", "conv_inc"])

    return fold


def streaming_funnel_increments(
    event_stream: DataFrame,
    from_type: str,
    to_type: str,
    horizon_s: int,
    late_slack_s: int = 0,
) -> DataFrame:
    """Event stream (event_id, ts, user_id, event_type, …) →
    append-mode increment stream (day, from_inc, conv_inc)."""
    return event_stream.groupBy("user_id").applyInPandasWithState(
        make_funnel_fold(from_type, to_type, horizon_s, late_slack_s),
        INC_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def funnel_from_increments(inc: DataFrame) -> DataFrame:
    """Collapse the increment stream/table to the batch funnel's
    output contract (day, n_from, n_converted, conv_rate)."""
    return (
        inc.groupBy("day")
        .agg(
            F.sum("from_inc").alias("n_from"),
            F.sum("conv_inc").alias("n_converted"),
        )
        .withColumn(
            "conv_rate",
            F.col("n_converted").cast("double") / F.col("n_from"),
        )
    )
