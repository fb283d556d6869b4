"""Bucketed interval (range) join — point-in-interval matching at scale.

Spark plans a bare ``l.ts BETWEEN r.start AND r.end`` join as
BroadcastNestedLoopJoin (all-pairs per partition) — quadratic and
memory-hostile at 100 TB. The standard fix re-expresses the range
predicate as an equi-join on a time-bucket key:

1. pick a bucket width (e.g. 7 days);
2. every interval explodes to the buckets it covers — bounded by
   ceil(interval_length / width) + 1 rows, a small constant for
   natural intervals (shipping windows, sessions, leases);
3. every point maps to exactly ONE bucket, so the equi-join on the
   bucket key never duplicates a (point, interval) pair;
4. the exact BETWEEN filter runs inside the join, after the hash
   match.

The join becomes a shuffle on an int key with per-bucket locality —
the same shape as every other equi-join in the engine, AQE-skew-safe.
Not in the reference (SURVEY.md §2.3 lists range joins as absent);
this is engine-surface breadth for log/event analytics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_days: int = 7,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point <= end`` (date or timestamp columns).

    Output: all point columns + all interval columns. ``how='inner'``
    drops points matching no interval; ``'left'`` keeps them with NULL
    interval columns (implemented as the inner bucket join + an
    anti-joined NULL branch, so no nested-loop plan appears either
    way).
    """

    def to_day(c: Column) -> Column:
        return F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date"))

    bkt = lambda c: F.floor(to_day(c) / bucket_days).cast("long")  # noqa: E731
    pts = points.withColumn("__bkt", bkt(F.col(point_col)))
    ivs = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(bkt(F.col(start_col)), bkt(F.col(end_col)))
        ),
    )
    matched = pts.join(ivs, "__bkt").filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    out_cols = points.columns + intervals.columns
    inner = matched.select(*out_cols)
    if how == "inner":
        return inner
    if how != "left":
        raise ValueError(f"unsupported how={how!r}")
    unmatched = points.join(
        inner.select(*points.columns), points.columns, "left_anti"
    )
    for c in intervals.columns:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c])
        )
    return inner.unionByName(unmatched.select(*out_cols))
