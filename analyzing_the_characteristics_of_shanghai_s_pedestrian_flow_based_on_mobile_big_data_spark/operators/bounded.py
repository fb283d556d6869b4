"""Per-key row caps for sequence-fold operators.

An ordered ARRAY FOLD (collect_list → fold) is the right Spark shape
for sequential recurrences (EWMA) and path assembly, but its aggregate
buffer is the one row-sized object Spark cannot spill: one hyperactive
key at 100 TB (a bot user, a monitoring event storm) would produce a
multi-GB row and OOM the executor that owns the key. ``cap_rows_per_key``
bounds the buffer BEFORE the aggregate with a window ``row_number``
filter — the window's exchange on the key columns is the same exchange
the downstream groupBy needs, so the cap adds a per-key sort (external,
spillable — exactly the resource profile a giant collect_list lacks)
but no extra shuffle.

Semantics: keys with at most ``cap`` rows are returned UNCHANGED
(pytest-pinned); keys beyond the cap keep their first (``keep='first'``)
or last (``keep='last'``) ``cap`` rows in the given order, a documented
truncation. ``MAX_SEQ_PER_KEY`` (65 536) is the engine default: for the
EWMA fold specifically, a value 65 536 halvings back contributes less
than 2^-65536 ≈ 0 in double arithmetic, so ``keep='last'`` truncation
is numerically indistinguishable from the full fold at any realistic
magnitude; for path mining, 65 536 events in one user-day is beyond any
human session and bounds the path string at a few MB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_SEQ_PER_KEY = 65_536


def cap_rows_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    cap: int,
    keep: str = "first",
) -> DataFrame:
    """Keep at most ``cap`` rows per key: the first ``cap`` in
    (order_cols asc) order, or the last ``cap`` when ``keep='last'``.
    Row order within the key is NOT otherwise changed for downstream
    consumers that re-sort (collect_list + array_sort callers)."""
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    ordering = [
        F.col(c).asc() if keep == "first" else F.col(c).desc()
        for c in order_cols
    ]
    w = Window.partitionBy(*key_cols).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(int(cap)))
        .drop("__rn")
    )
