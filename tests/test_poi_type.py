"""POI-type assignment: cascade precedence (J2 on types) and
nearest-POI typing (D3 replacement) — cal_subarea_portion parity."""

from __future__ import annotations

import pyspark.sql.functions as F

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.region_build import (
    assign_poi_type,
    build_region_dim,
    nearest_poi_type,
)

# Three distinct Shanghai-area spots, far enough apart to differ at
# geohash6 (and a fortiori geohash7/8).
SPOT_A = (31.2304, 121.4737)
SPOT_B = (31.0500, 121.2500)
SPOT_C = (31.4000, 121.7000)


def _poi(spark):
    rows = [
        # spot A hosts BOTH a type-7 POI and a type-1 POI: the cascade
        # must pick 7 (higher priority, finer precision).
        (SPOT_A[1], SPOT_A[0], 7, "transport-hub", 1.0),
        (SPOT_A[1], SPOT_A[0], 1, "residence", 1.0),
        (SPOT_B[1], SPOT_B[0], 2, "school", 1.0),
    ]
    return build_region_dim(
        spark.createDataFrame(
            rows,
            "longitude double, latitude double, type int, Title string, Larea double",
        ),
        precisions=(5, 6, 7, 8),
    )


def test_type_cascade_priority_and_default(spark):
    pings = spark.createDataFrame(
        [
            ("p1", SPOT_A[1], SPOT_A[0]),  # type 7 wins over type 1
            ("p2", SPOT_B[1], SPOT_B[0]),  # only type 2 matches
            ("p3", 125.0, 29.0),           # open sea → default 8
        ],
        "id string, lgt double, ltt double",
    )
    out = {r.id: r.poi_type for r in assign_poi_type(pings, _poi(spark)).collect()}
    assert out == {"p1": 7, "p2": 2, "p3": 8}


def test_nearest_poi_type_picks_argmin(spark):
    poi = spark.createDataFrame(
        [
            (1, SPOT_A[0], SPOT_A[1], 3),
            (1, SPOT_C[0], SPOT_C[1], 5),
        ],
        "agent_id int, latitude double, longitude double, type int",
    )
    pings = spark.createDataFrame(
        [
            ("near_a", 1, SPOT_A[1] + 0.001, SPOT_A[0] + 0.001),
            ("near_c", 1, SPOT_C[1] - 0.001, SPOT_C[0] - 0.001),
        ],
        "id string, agent_id int, lgt double, ltt double",
    )
    out = {r.id: r.nearest_type for r in nearest_poi_type(pings, poi).collect()}
    assert out == {"near_a": 3, "near_c": 5}


def test_nearest_poi_tie_breaks_to_smallest_type(spark):
    poi = spark.createDataFrame(
        [(1, SPOT_A[0], SPOT_A[1], 4), (1, SPOT_A[0], SPOT_A[1], 2)],
        "agent_id int, latitude double, longitude double, type int",
    )
    pings = spark.createDataFrame(
        [("p", 1, SPOT_A[1], SPOT_A[0])], "id string, agent_id int, lgt double, ltt double"
    )
    assert nearest_poi_type(pings, poi).collect()[0].nearest_type == 2


def test_neighbor_expanded_region_match(spark):
    """D7: a ping in a cell ADJACENT to a POI's cell still matches when
    the dim is expanded with geohash_neighbors (cal_orig_area.py:62-72
    driver loop, re-expressed as explode over the dim)."""
    import pyspark.sql.functions as F

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.functions.geohash import (
        _decode_bbox,
        geohash_encode,
        geohash_neighbors,
    )

    dim = spark.createDataFrame([(1, SPOT_A[0], SPOT_A[1])], "agent_id int, lat double, lon double")
    expanded = dim.select(
        "agent_id",
        F.explode(
            geohash_neighbors(geohash_encode(F.col("lat"), F.col("lon"), 6))
        ).alias("cell"),
    )
    # place a ping just across the cell's east edge (next cell over)
    cell = expanded.collect()  # 9 cells incl. center
    assert len(cell) == 9
    lat_min, lat_max, lon_min, lon_max = _decode_bbox(
        [r.cell for r in cell][4]
    )
    ping = spark.createDataFrame(
        [("p", (lat_min + lat_max) / 2, lon_max + 0.0001)],
        "id string, ltt double, lgt double",
    )
    joined = ping.withColumn(
        "cell", geohash_encode(F.col("ltt"), F.col("lgt"), 6)
    ).join(expanded, "cell", "inner")
    assert joined.count() >= 1
