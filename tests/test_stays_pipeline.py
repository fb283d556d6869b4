from __future__ import annotations

from conftest import ts

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.stays import (
    stay_segments,
)


def test_stays_break_on_region_change_and_missing_hour(spark):
    pos = spark.createDataFrame(
        [
            # stay 1: region 5, 10:00–12:00
            (1, ts("2024-01-01 10:00:00"), 5),
            (1, ts("2024-01-01 11:00:00"), 5),
            (1, ts("2024-01-01 12:00:00"), 5),
            # region change → stay 2
            (1, ts("2024-01-01 13:00:00"), 6),
            # hour gap in same region → stay 3
            (1, ts("2024-01-01 16:00:00"), 6),
        ],
        "user_id long, hour timestamp, region_id int",
    )
    stays = sorted(
        (r.region_id, r.stay_start, r.n_hours)
        for r in stay_segments(pos).collect()
    )
    assert stays == [
        (5, ts("2024-01-01 10:00:00"), 3),
        (6, ts("2024-01-01 13:00:00"), 1),
        (6, ts("2024-01-01 16:00:00"), 1),
    ]


def test_full_pipeline_runner(spark, tmp_path):
    """pipelines.run_pipeline: TSV in → all seven products out."""
    from test_pipeline_e2e import DOWNTOWN, SUBURB, _poi, _write_fixture_tsv

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.pipelines import (
        run_pipeline,
    )

    products = run_pipeline(
        spark,
        _write_fixture_tsv(tmp_path),
        None,
        str(tmp_path / "out"),
        poi_df=_poi(spark).select(
            "longitude", "latitude", "type", "Title", "Larea"
        ),
    )
    assert set(products) == {
        "occupancy",
        "od_matrix",
        "od_fractions",
        "home",
        "type_occupancy",
        "stays",
        "dwell_stats",
    }
    for name, df in products.items():
        assert df.count() > 0, name
        back = spark.read.parquet(str(tmp_path / "out" / name))
        assert back.count() == df.count(), name
    # user A's home is the suburb (two night anchors there)
    homes = {r.user_id: r.home_region for r in products["home"].collect()}
    assert "A" in homes
