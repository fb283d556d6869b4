from __future__ import annotations

from conftest import ts

import pyspark.sql.functions as F

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators import (
    cascade_join,
    home_location,
    mode_per_group,
    night_single_region_users,
    occupancy,
    od_fractions,
    od_matrix,
)


def test_occupancy_counts_distinct_users(spark):
    pos = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 5),
            (1, ts("2024-01-01 10:00:00"), 5),  # dup ping, same user
            (2, ts("2024-01-01 10:00:00"), 5),
            (1, ts("2024-01-01 11:00:00"), 5),
        ],
        "user_id long, hour timestamp, region_id int",
    )
    rows = {(r.region_id, r.hour): r.n_users for r in occupancy(pos).collect()}
    assert rows[(5, ts("2024-01-01 10:00:00"))] == 2
    assert rows[(5, ts("2024-01-01 11:00:00"))] == 1


def test_mode_per_group_tiebreak_smallest(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "a"), (1, "b"), (1, "a"), (2, "z")], "g long, v string"
    )
    got = {r.g: r.v for r in mode_per_group(df, "g", "v").collect()}
    assert got == {1: "a", 2: "z"}  # tie 2-2 → smallest value


def test_od_fractions_rows_sum_to_one(spark):
    edges = spark.createDataFrame(
        [
            (1, 5, ts("2024-01-01 10:00:00"), ts("2024-01-01 09:00:00"), 4),
            (2, 6, ts("2024-01-01 10:00:00"), ts("2024-01-01 09:00:00"), 4),
            (3, 6, ts("2024-01-01 10:00:00"), ts("2024-01-01 09:00:00"), 4),
        ],
        "user_id long, region_id int, hour timestamp, pre_hour timestamp, pre_region_id int",
    )
    od = od_matrix(edges)
    frac = od_fractions(od)
    sums = (
        frac.groupBy("hour", "orig").agg(F.sum("frac").alias("s")).collect()
    )
    assert all(abs(r.s - 1.0) < 1e-12 for r in sums)
    got = {(r.orig, r.dest): r.frac for r in frac.collect()}
    assert abs(got[(4, 6)] - 2 / 3) < 1e-12


def test_cascade_join_precedence_and_default(spark):
    fact = spark.createDataFrame(
        [(1, "aaa", "aa"), (2, "bbb", "bb"), (3, "zzz", "zz")],
        "id long, fine string, coarse string",
    )
    dim_fine = spark.createDataFrame([("aaa", "FINE_A")], "k string, v string")
    dim_coarse = spark.createDataFrame(
        [("aa", "COARSE_A"), ("bb", "COARSE_B")], "k string, v string"
    )
    out = cascade_join(
        fact,
        [(dim_fine, "fine", "k", "v"), (dim_coarse, "coarse", "k", "v")],
        "label",
        F.lit("DEFAULT"),
    )
    got = {r.id: r.label for r in out.collect()}
    # id 1 matches both levels → fine wins; id 2 only coarse; id 3 default
    assert got == {1: "FINE_A", 2: "COARSE_B", 3: "DEFAULT"}


def test_home_location_mode_over_nights(spark):
    rows = []
    # user 1: 3 nights anchored in region 7, 1 night in region 9
    for d in (1, 2, 3):
        rows.append((1, ts(f"2024-01-0{d} 21:00:00"), 7))
        rows.append((1, ts(f"2024-01-0{d} 23:00:00"), 9))  # later → not anchor
    rows.append((1, ts("2024-01-04 20:00:00"), 9))
    pings = spark.createDataFrame(rows, "user_id long, ts timestamp, region_id int")
    got = home_location(pings).collect()
    assert len(got) == 1 and got[0].home_region == 7


def test_night_window_wraps_past_midnight(spark):
    # 02:00 belongs to the previous date's night
    pings = spark.createDataFrame(
        [(1, ts("2024-01-02 02:00:00"), 5), (1, ts("2024-01-01 22:00:00"), 5)],
        "user_id long, ts timestamp, region_id int",
    )
    got = night_single_region_users(pings).collect()
    assert len(got) == 1 and got[0].n_regions == 1


def test_to_wide_pivot(spark):
    from conftest import ts
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.od import (
        to_wide,
    )

    od = spark.createDataFrame(
        [
            (ts("2024-01-01 10:00:00"), 1, 1, 5),
            (ts("2024-01-01 10:00:00"), 1, 2, 3),
            (ts("2024-01-01 10:00:00"), 2, 1, 7),
        ],
        "hour timestamp, orig int, dest int, cnt long",
    )
    wide = to_wide(od, [1, 2])
    rows = {r.orig: (r["1"], r["2"]) for r in wide.collect()}
    assert rows == {1: (5, 3), 2: (7, 0)}


def test_session_window_agrees_with_sessionize(spark):
    """Cross-validation: Spark's built-in session_window produces the
    same per-user session count as our sessionize operator."""
    import pyspark.sql.functions as F

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.sessions import (
        sessionize,
    )
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
        load_events,
    )
    from conftest import SF_SMALL

    ev = load_events(spark, SF_SMALL).select("user_id", "ts")
    ours = (
        sessionize(ev, gap_minutes=30)
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"))
    )
    builtin = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    a = {r.user_id: r.n_sessions for r in ours.collect()}
    b = {r.user_id: r.n_sessions for r in builtin.collect()}
    assert a == b
