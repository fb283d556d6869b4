"""Source/sink coverage: temp-view caching (S6), coalesced CSV sink
(S9), partitioned parquet layout + partition pruning (S5/S8)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from conftest import SF_SMALL

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.plans import (
    physical_plan,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
    load_events,
    load_table,
)


def test_cached_temp_view_roundtrip(spark):
    """S6: registerTempTable + cacheTable (subarea_matrix.py:29-30)."""
    df = load_table(spark, SF_SMALL, "nation")
    df.createOrReplaceTempView("nation_v")
    spark.catalog.cacheTable("nation_v")
    try:
        n = spark.sql("SELECT count(*) AS n FROM nation_v").collect()[0].n
        assert n == 25
        assert spark.catalog.isCached("nation_v")
    finally:
        spark.catalog.uncacheTable("nation_v")


def test_coalesced_csv_sink(spark, tmp_path):
    """S9: single-file CSV report sink, coalesce not repartition
    (cal_mobility_matrix.py:92-93 — their repartition(1) shuffles)."""
    out = str(tmp_path / "report_csv")
    df = load_table(spark, SF_SMALL, "region")
    df.coalesce(1).write.option("header", True).mode("overwrite").csv(out)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 1
    back = spark.read.option("header", True).csv(out)
    assert back.count() == df.count()


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """S5/S8: date-partition layout makes date predicates prune files."""
    out = str(tmp_path / "events_by_day")
    ev = load_events(spark, SF_SMALL).withColumn("day", F.to_date("ts"))
    ev.write.partitionBy("day").mode("overwrite").parquet(out)
    days = [d for d in os.listdir(out) if d.startswith("day=")]
    assert len(days) > 1
    pruned = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    plan = physical_plan(pruned)
    assert "PartitionFilters: [" in plan
    assert pruned.count() > 0


def test_jsonl_and_orc_roundtrip(spark, tmp_path):
    """JSON-lines and ORC sinks round-trip values and (for ORC) push
    filters down to the scan like parquet does."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources.tables import (
        read_jsonl,
        read_orc,
        write_jsonl,
        write_orc,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}", float(i) / 7) for i in range(100)],
        "id long, text string, score double",
    )
    jp = str(tmp_path / "docs_jsonl")
    write_jsonl(df, jp)
    back = read_jsonl(spark, jp, schema="id long, text string, score double")
    assert back.count() == 100
    assert {r.id for r in back.filter("id < 3").collect()} == {0, 1, 2}

    op = str(tmp_path / "docs_orc")
    write_orc(df, op)
    oback = read_orc(spark, op).filter("id >= 90").select("id", "score")
    plan = oback._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThanOrEqual(id,90)" in plan
    assert oback.count() == 10


def test_register_views_sql_api(spark):
    """Pure-SQL usage: registered views answer spark.sql queries with
    results identical to the DataFrame API, and predicate pushdown
    survives the view indirection."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources.tables import (
        load_table,
        register_views,
    )

    names = register_views(spark, "/root/testdata/sf0.001")
    assert "events" in names and len(names) == 10
    sql_rows = spark.sql(
        "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
    ).collect()
    df_rows = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("event_type")
        .agg(__import__("pyspark").sql.functions.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, sql_rows)) == sorted(map(tuple, df_rows))
    plan = (
        spark.sql("SELECT o_orderkey FROM orders WHERE o_orderkey = 42")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)" in plan


def test_compact_parquet_merges_small_files(spark, tmp_path):
    import glob

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources.tables import (
        compact_parquet,
    )

    src = str(tmp_path / "frag")
    spark.range(10_000).selectExpr("id", "id % 97 AS k").repartition(40).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*")) == 40

    out = str(tmp_path / "compact")
    compact_parquet(spark, src, out, target_rows_per_file=5_000, sort_col="id")
    files = glob.glob(f"{out}/part-*")
    assert len(files) <= 3  # 10k rows / 5k target (+1 range-skew slack)
    back = spark.read.parquet(out)
    assert back.count() == 10_000
    # sorted layout: an id-range predicate prunes to a subset of files
    pruned = back.filter("id < 100").count()
    assert pruned == 100
