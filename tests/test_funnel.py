"""Conversion-funnel semantics: horizon boundary, same-ts ties, and
the no-self-join plan shape."""

from __future__ import annotations

from conftest import ts

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.funnel import (
    conversion_funnel,
    next_match_ts,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"

ROWS = [
    # u1: click -> purchase 59m59s later = converted
    (1, ts("2024-01-01 10:00:00"), 1, "click"),
    (2, ts("2024-01-01 10:59:59"), 1, "purchase"),
    # u1: click -> purchase exactly at horizon = converted (<=)
    (3, ts("2024-01-02 10:00:00"), 1, "click"),
    (4, ts("2024-01-02 11:00:00"), 1, "purchase"),
    # u2: click -> purchase 1s past horizon = NOT converted
    (5, ts("2024-01-01 10:00:00"), 2, "click"),
    (6, ts("2024-01-01 11:00:01"), 2, "purchase"),
    # u3: click with no purchase ever
    (7, ts("2024-01-01 12:00:00"), 3, "click"),
    # u4: purchase BEFORE the click only -> not converted
    (8, ts("2024-01-03 09:00:00"), 4, "purchase"),
    (9, ts("2024-01-03 10:00:00"), 4, "click"),
    # u5: same-ts tie — purchase has the LARGER event_id, counts as after
    (10, ts("2024-01-04 10:00:00"), 5, "click"),
    (11, ts("2024-01-04 10:00:00"), 5, "purchase"),
    # u6: same-ts tie — purchase has the SMALLER event_id, counts as before
    (13, ts("2024-01-04 10:00:00"), 6, "click"),
    (12, ts("2024-01-04 10:00:00"), 6, "purchase"),
]


def test_funnel_boundary_and_tie_semantics(spark):
    ev = spark.createDataFrame(ROWS, SCHEMA)
    out = {
        str(r.day): (r.n_from, r.n_converted)
        for r in conversion_funnel(ev, "click", "purchase", 3600).collect()
    }
    assert out == {
        "2024-01-01": (3, 1),  # u1 converted; u2 past horizon; u3 never
        "2024-01-02": (1, 1),  # exactly at horizon counts
        "2024-01-03": (1, 0),  # purchase was before the click
        "2024-01-04": (2, 1),  # tie: larger id converts, smaller doesn't
    }


def test_next_match_is_earliest_at_or_after(spark):
    rows = [
        (1, ts("2024-01-01 10:00:00"), 1, "click"),
        (2, ts("2024-01-01 10:30:00"), 1, "purchase"),
        (3, ts("2024-01-01 11:00:00"), 1, "purchase"),
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    got = {
        r.event_id: r.next_purchase_ts
        for r in next_match_ts(ev, "purchase").collect()
    }
    assert got[1] == ts("2024-01-01 10:30:00")  # earliest, not latest
    assert got[2] == ts("2024-01-01 10:30:00")  # at-or-after includes self
    assert got[3] == ts("2024-01-01 11:00:00")


def test_funnel_plan_has_no_join(spark):
    """The window formulation must not plan a self-join (the naive
    theta-join rewrite is the scale hazard this operator avoids)."""
    ev = spark.createDataFrame(ROWS, SCHEMA)
    plan = (
        conversion_funnel(ev, "click", "purchase", 3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
