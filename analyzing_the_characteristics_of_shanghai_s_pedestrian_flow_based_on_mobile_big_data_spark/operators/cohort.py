"""Cohort retention — the first-seen / still-active matrix.

Classic product-analytics operator the reference's occupancy scripts
stop short of: bucket every user by their first-activity period (the
cohort), then count how many are active again k periods later. The
output is the retention triangle (cohort_week, week_offset,
n_active, retention) product teams read left-to-right.

Scale shape — no join anywhere:

1. distinct (user, week) pairs — one shuffle, payload already
   users×weeks (≪ events);
2. first-seen via a min() WINDOW over the user key — replaces the
   groupBy + self-join formulation (which planned 4 extra exchanges:
   the aggregate, both join sides, and the base re-join);
3. the (cohort, offset) counts are a plain count(*) — each user
   contributes at most one distinct week per offset by construction,
   so no countDistinct expand is needed;
4. the cohort-size denominator is a window max over the periods²-row
   matrix — negligible.

The (cohort, offset) matrix itself is bounded by periods², i.e. tiny.
Deterministic: integer period arithmetic (ISO weeks via date_trunc +
day-difference/7), exact distinct user counts, one IEEE division for
the retention ratio.

No counterpart in the reference — engine breadth (SURVEY.md §2
extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention over an event stream.

    Returns (cohort_week date, week_offset int, n_active bigint,
    retention double): distinct ``user_col`` actives per cohort per
    week offset, with retention = n_active / cohort size (the offset-0
    row ≡ 1.0). Weeks are ISO-Monday truncations on both engines and
    the offset is an exact day-difference / 7 integer division, so
    every key is integer-deterministic.
    """
    from pyspark.sql import Window

    aw = events.select(
        F.col(user_col).alias("u"),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("act_week"),
    ).distinct()
    w_u = Window.partitionBy("u")
    j = aw.select(
        "u",
        F.min("act_week").over(w_u).alias("cohort_week"),
        "act_week",
    ).select(
        "u",
        "cohort_week",
        (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7)
        .cast("int")
        .alias("week_offset"),
    )
    # count(*), not countDistinct(u): rows are distinct (u, act_week)
    # and act_week ↔ week_offset is 1:1 within a cohort, so each user
    # appears at most once per (cohort_week, week_offset) group
    counts = j.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_active")
    )
    w_c = Window.partitionBy("cohort_week")
    return counts.select(
        "cohort_week",
        "week_offset",
        "n_active",
        (
            F.col("n_active").cast("double")
            / F.max(
                F.when(F.col("week_offset") == 0, F.col("n_active"))
            ).over(w_c).cast("double")
        ).alias("retention"),
    )
