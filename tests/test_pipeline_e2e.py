"""End-to-end mini-city pipeline — the reference's full flow on a
deterministic synthetic fixture (SURVEY.md §5.4):

raw TSV → typed ETL → partitioned parquet → POI region dim (geohash +
dense_rank) → cascade region assignment → hourly positions → gap-fill →
occupancy + OD + home location.

Covers S1/S2/S8 sources/sinks, D1 geohash UDFs, J2 cascade, and the
full trajectory product chain in the reference's own (imei, lgt, ltt,
ts) shape rather than the events proxy.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators import (
    gap_fill_edges,
    home_location,
    occupancy,
    od_matrix,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.region_build import (
    assign_region,
    build_region_dim,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
    read_pings_tsv,
    write_partitioned_parquet,
)

# Two "regions" ~20 km apart in Shanghai; geohash5 cells differ.
DOWNTOWN = (31.2304, 121.4737)
SUBURB = (31.0500, 121.2500)


def _write_fixture_tsv(tmp_path) -> str:
    rows = [
        "imei_id\timsi\tlgt\tltt\tts",
        # user A: downtown 08:00, 09:00; suburb 12:00 (3h gap → fill)
        f"A\tA1\t{DOWNTOWN[1]}\t{DOWNTOWN[0]}\t2019-07-01 08:10:00",
        f"A\tA1\t{DOWNTOWN[1]}\t{DOWNTOWN[0]}\t2019-07-01 08:40:00",
        f"A\tA1\t{DOWNTOWN[1]}\t{DOWNTOWN[0]}\t2019-07-01 09:05:00",
        f"A\tA1\t{SUBURB[1]}\t{SUBURB[0]}\t2019-07-01 12:30:00",
        # user A at night in suburb (home signal), two nights
        f"A\tA1\t{SUBURB[1]}\t{SUBURB[0]}\t2019-07-01 21:00:00",
        f"A\tA1\t{SUBURB[1]}\t{SUBURB[0]}\t2019-07-02 21:30:00",
        # user B: only downtown, day 2
        f"B\tB1\t{DOWNTOWN[1]}\t{DOWNTOWN[0]}\t2019-07-02 10:00:00",
        # user C: outside any region (open sea)
        "C\tC1\t125.0\t29.0\t2019-07-01 10:00:00",
    ]
    p = tmp_path / "pings.tsv"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def _poi(spark):
    return spark.createDataFrame(
        [
            (DOWNTOWN[1], DOWNTOWN[0], 1, "downtown", 1.0),
            (SUBURB[1], SUBURB[0], 2, "suburb", 1.0),
        ],
        "longitude double, latitude double, type int, Title string, Larea double",
    )


def test_full_pipeline(spark, tmp_path):
    # ETL: TSV → typed df with derived date → partitioned parquet (S1/S8)
    raw = read_pings_tsv(spark, _write_fixture_tsv(tmp_path))
    out = str(tmp_path / "pings_parquet")
    write_partitioned_parquet(raw, out)
    pings = spark.read.parquet(out)
    assert pings.count() == 8
    assert set(pings.select("date").distinct().toPandas()["date"].astype(str)) == {
        "2019-07-01",
        "2019-07-02",
    }

    # region dim: geohash + dense agent ids (region.py parity)
    dim = build_region_dim(_poi(spark))
    dim_rows = {r.Title: r.agent_id for r in dim.collect()}
    assert set(dim_rows.values()) == {1, 2}

    # cascade assignment: in-region pings matched, sea ping → 0
    assigned = assign_region(pings, dim)
    by_user = assigned.groupBy("imei_id").agg(
        F.collect_set("region_id").alias("regions")
    )
    regions = {r.imei_id: set(r.regions) for r in by_user.collect()}
    assert regions["C"] == {0}
    assert 0 not in regions["A"] and len(regions["A"]) == 2

    # trajectory products on the assigned pings
    pos = (
        assigned.withColumn("hour", F.date_trunc("hour", "ts"))
        .groupBy(F.col("imei_id").alias("user_id"), "hour")
        .agg(F.max_by("region_id", "ts").alias("region_id"))
    )
    edges = gap_fill_edges(pos)
    occ = occupancy(edges.withColumnRenamed("region_id", "region_id"))
    assert occ.count() > 0
    od = od_matrix(edges)
    # A moved downtown → suburb at 12:00 after 2h fill in downtown
    a_dt = dim_rows["downtown"]
    a_sb = dim_rows["suburb"]
    moves = {
        (r.orig, r.dest): r.cnt
        for r in od.filter(F.col("orig") != F.col("dest")).collect()
    }
    assert (a_dt, a_sb) in moves

    # home: A anchors both nights in suburb
    home = home_location(
        assigned.select(F.col("imei_id").alias("user_id"), "ts", "region_id")
    )
    homes = {r.user_id: r.home_region for r in home.collect()}
    assert homes["A"] == a_sb
