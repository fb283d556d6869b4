"""As-of (last-value-before) join — a capability Spark lacks natively.

Not exercised by the reference (its temporal alignment is lag+gap-fill,
SURVEY.md §2.3 note), but essential log-analytics surface: attach to
each left row the most recent right row for the same key at or before
the left timestamp.

Implementation is the union-window trick — fully Catalyst-native, one
shuffle on (key), no python, no per-group pandas merge_asof:

1. tag both sides, union by name over (key, ts, side, right-payload);
2. window per key ordered by (ts, side-priority): ``last`` of the
   right payload with ignoreNulls over the running frame = latest
   right row seen so far;
3. keep left rows.

Right rows sort before left rows at equal ts (side priority), so an
exactly-simultaneous right row IS matched (inclusive as-of).

Atomicity: all payload columns ride in ONE struct and the window takes
``last(ignorenulls)`` over that struct — every ``asof_*`` output column
comes from the *same* matched right row, even when some payload values
are legitimately NULL (per-column last() would backfill those from
older rows, stitching a row that never existed). Ties among right rows
at the same (key, ts) break on the payload struct itself (largest
wins) — a total order on values, deterministic across partitionings.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Left rows + latest right ``payload_cols`` with
    right.ts ≤ left.ts per ``on`` key (null payload when no prior row).
    """
    lcols = left.columns
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__p"),
    )
    payload_type = r.schema["__p"].dataType
    for c in lcols:
        if c not in (on,):
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    l = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
        .withColumn("__p", F.lit(None).cast(payload_type))
    )
    u = l.select(*lcols, "__ts", "__side", "__p").unionByName(
        r.select(*lcols, "__ts", "__side", "__p")
    )
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col("__ts").asc(),
            F.col("__side").asc(),
            # total tiebreak among same-(key, ts) right rows: the
            # running-frame last() then deterministically picks the
            # largest payload struct
            F.col("__p").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = u.withColumn("__asof", F.last("__p", ignorenulls=True).over(w))
    return out.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col(f"__asof.{c}").alias(f"asof_{c}") for c in payload_cols],
    )
