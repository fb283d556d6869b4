"""Conversion-funnel analytics — "did B follow A within the horizon?".

Sequence analytics the reference never reaches (its event log only
feeds presence counts), but a first-class ask of any event pipeline:
for every `from_type` event, find the same user's next `to_type`
event and decide whether it landed inside the conversion horizon.

Spark-first shape: one window per user ordered by (ts, id) DESC with a
running ``min(CASE WHEN type = to_type THEN ts END)`` — i.e. "earliest
to_type event at-or-after this row" — computed in a single pass. No
self-join (the naive formulation joins the event table to itself on
user + ts-range: a second full shuffle plus a skew-prone theta
predicate); the window costs exactly one shuffle on ``user_col``, the
same partitioning every other per-user operator here uses.

Determinism: ties on ``ts`` break by ``id_col`` in the SAME direction
on both engines, so the oracle twin reproduces row-identical output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def next_match_ts(
    events: DataFrame,
    to_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """All events + ``next_{to_type}_ts``: the same user's earliest
    ``to_type`` event timestamp at-or-after each row (at the same
    ``ts``, only rows with a larger ``id_col`` count as "after").

    A running min over the DESCENDING (ts, id) order — rows BEFORE the
    current one in that order are exactly the events at-or-after it in
    time. One window, one shuffle."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).desc(), F.col(id_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = F.min(
        F.when(F.col(type_col) == to_type, F.col(ts_col))
    ).over(w)
    return events.withColumn(f"next_{to_type}_ts", nxt)


def conversion_funnel(
    events: DataFrame,
    from_type: str,
    to_type: str,
    horizon_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Daily conversion funnel: per ``from_type``-event date, how many
    fired, how many were followed by a ``to_type`` event of the same
    user within ``horizon_s`` seconds, and the conversion rate.

    Output: (day, n_from, n_converted, conv_rate). The rate is a
    single integer-over-integer division — deterministic across
    engines."""
    nxt_col = f"next_{to_type}_ts"
    enriched = next_match_ts(
        events, to_type, user_col, ts_col, type_col, id_col
    )
    # interval arithmetic, NOT unix_timestamp subtraction: the event
    # timestamps carry microseconds, and unix_timestamp truncates to
    # whole seconds — a truncated diff can flip the horizon boundary
    # (and diverge from the oracle's exact timestamp comparison)
    converted = (
        F.col(nxt_col).isNotNull()
        & (
            F.col(nxt_col)
            <= F.col(ts_col) + F.expr(f"INTERVAL {int(horizon_s)} SECOND")
        )
    ).cast("int")
    return (
        enriched.filter(F.col(type_col) == from_type)
        .groupBy(F.to_date(ts_col).alias("day"))
        .agg(
            F.count("*").alias("n_from"),
            F.sum(converted).alias("n_converted"),
            (F.sum(converted).cast("double") / F.count("*")).alias(
                "conv_rate"
            ),
        )
    )
