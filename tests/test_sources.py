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


def test_permissive_tsv_quarantines_corrupt_rows(spark, tmp_path):
    """A malformed line lands in _corrupt with the raw text; clean
    rows parse normally; the job never fails (100 TB ETL contract)."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources.tables import (
        read_pings_tsv_permissive,
    )

    p = tmp_path / "pings.tsv"
    p.write_text(
        "imei_id\timsi\tlgt\tltt\tts\n"
        "1\ti1\t121.5\t31.2\t2024-01-01 10:00:00\n"
        "2\ti2\tbad\tworse\tnot-a-timestamp\n"
        "3\ti3\t121.6\t31.3\t2024-01-02 11:00:00\n"
    )
    df = read_pings_tsv_permissive(spark, str(p)).cache()
    clean = df.filter(F.col("_corrupt").isNull())
    bad = df.filter(F.col("_corrupt").isNotNull())
    assert clean.count() == 2
    assert bad.count() == 1
    assert "not-a-timestamp" in bad.collect()[0]._corrupt
    df.unpersist()


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """mergeSchema unions generations of a growing table: old files
    backfill the new column with NULL — the append-only evolution
    story a 100 TB lake needs (no rewrite of history)."""
    d = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a")], "id long, v string").write.mode(
        "append"
    ).parquet(d)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(d)
    df = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(df.columns) == {"id", "v", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows[1] is None and rows[2] == 9.5


def _write_min_xlsx(path, header, rows):
    """Minimal SpreadsheetML writer: shared strings for str cells,
    numeric cells inline — enough to exercise both parse paths."""
    import zipfile

    strings: list[str] = []

    def sref(s):
        if s not in strings:
            strings.append(s)
        return strings.index(s)

    def colref(i, r):
        letters = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            letters = chr(ord("A") + rem) + letters
        return f"{letters}{r}"

    body = []
    for rn, row in enumerate([header] + rows, start=1):
        cells = []
        for ci, v in enumerate(row):
            if v is None:
                continue  # gap cell — reader must keep alignment
            ref = colref(ci, rn)
            if isinstance(v, str):
                cells.append(f'<c r="{ref}" t="s"><v>{sref(v)}</v></c>')
            else:
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')
        body.append(f'<row r="{rn}">' + "".join(cells) + "</row>")
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
        + "".join(body)
        + "</sheetData></worksheet>"
    )
    sst = (
        f'<?xml version="1.0"?><sst xmlns="{ns}">'
        + "".join(f"<si><t>{s}</t></si>" for s in strings)
        + "</sst>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", sst)


def test_read_poi_xlsx_roundtrip(spark, tmp_path):
    """stdlib xlsx reader: header→columns, shared strings, numeric
    cells (as strings), gap cells keep column alignment."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
        read_poi_xlsx,
    )

    p = str(tmp_path / "poi.xlsx")
    _write_min_xlsx(
        p,
        ["point", "type", "name"],
        [
            ["[[121.3, 30.7]]", "7", "南京西路"],
            ["[[121.4, 31.2]]", None, "静安寺"],  # gap cell
            [42, "3", "plaza"],  # numeric cell
        ],
    )
    df = read_poi_xlsx(spark, p)
    assert df.columns == ["point", "type", "name"]
    rows = [tuple(r) for r in df.collect()]
    assert rows[0] == ("[[121.3, 30.7]]", "7", "南京西路")
    assert rows[1] == ("[[121.4, 31.2]]", None, "静安寺")
    assert rows[2] == ("42", "3", "plaza")


def test_read_poi_xlsx_reference_file(spark):
    """Parity: the reference's actual spreadsheet parses with the
    documented shape (25 786 POIs, point/type/name) — cf.
    geo-analytics/子区域划分/shanghai.xlsx."""
    import os

    import pytest

    path = "/root/reference/geo-analytics/子区域划分/shanghai.xlsx"
    if not os.path.exists(path):
        pytest.skip("reference spreadsheet not present")
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
        read_poi_xlsx,
    )

    df = read_poi_xlsx(spark, path)
    assert df.columns == ["point", "type", "name"]
    assert df.count() == 25785
    assert df.filter("point IS NULL").count() == 0


def test_read_poi_district_csv_type_variant(spark, tmp_path):
    """The type{1..7}.csv header shape (Point,Type,NAME,KIND,…) —
    geo-analytics/子区域划分/type7.csv:1 — normalizes into the POI
    schema with kind/admincode passthrough."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
        read_poi_district_csv,
    )

    p = str(tmp_path / "type7.csv")
    with open(p, "w", encoding="utf-8") as f:
        f.write(
            "Point,Type,NAME,KIND,TELEPHONE,ADMINCODE,ADDRESS\n"
            '"[[121.3405641, 30.709522934999985]]",7,公园甲,7300,021-5793,310116,路16号\n'
            '"not a point",7,broken,7300,,310116,x\n'
        )
    df = read_poi_district_csv(spark, p)
    assert df.columns == ["longitude", "latitude", "type", "Title", "kind", "admincode"]
    rows = df.orderBy("Title").collect()
    good = rows[1]
    assert good["longitude"] == 121.3405641
    assert good["latitude"] == 30.709522934999985
    assert good["type"] == 7
    assert good["Title"] == "公园甲"
    assert good["kind"] == "7300"
    assert good["admincode"] == "310116"
    # malformed point → NULL coords, row preserved for quarantine
    bad = rows[0]
    assert bad["longitude"] is None and bad["latitude"] is None


def test_read_poi_district_csv_district_variant(spark, tmp_path):
    """The shanghai_<district>.csv header shape (name,point,type) with
    float-literal types — geo-analytics/子区域划分/shanghai_jingan.csv:1."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
        read_poi_district_csv,
    )

    p = str(tmp_path / "jingan.csv")
    with open(p, "w", encoding="utf-8") as f:
        f.write(
            "name,point,type\n"
            '丁香公寓,"[[121.43457251990594, 31.216145759619124]]",1.0\n'
        )
    df = read_poi_district_csv(spark, p)
    r = df.collect()[0]
    assert r["longitude"] == 121.43457251990594
    assert r["latitude"] == 31.216145759619124
    assert r["type"] == 1
    assert r["Title"] == "丁香公寓"
    assert r["kind"] is None and r["admincode"] is None


def test_read_poi_district_csv_reference_files(spark):
    """Parity against the reference's own district exports: every
    type{1..7}.csv and shanghai_jingan.csv parse with non-null
    coordinates and the declared type."""
    import glob
    import os

    import pytest

    base = "/root/reference/geo-analytics/子区域划分"
    if not os.path.isdir(base):
        pytest.skip("reference district files not present")
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
        read_poi_district_csv,
    )

    for path in sorted(glob.glob(f"{base}/type*.csv")) + [
        f"{base}/shanghai_jingan.csv"
    ]:
        df = read_poi_district_csv(spark, path)
        n = df.count()
        assert n > 0, path
        assert df.filter("longitude IS NULL OR latitude IS NULL").count() == 0, path
        assert df.filter("type IS NULL").count() == 0, path


def test_read_xlsx_rows_size_guard(tmp_path):
    """The driver-side xlsx ingest is for dims only: a worksheet whose
    uncompressed XML exceeds the bound is refused up front (from ZIP
    directory metadata, before any parse) with a pointer at the
    distributed CSV/parquet path."""
    import pytest

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
        read_xlsx_rows,
    )

    p = str(tmp_path / "tiny.xlsx")
    _write_min_xlsx(p, ["a", "b"], [["1", "2"]])
    # parses fine at the default bound
    header, rows = read_xlsx_rows(p)
    assert header == ["a", "b"] and len(rows) == 1
    # same file refused when the bound is below its XML size
    with pytest.raises(ValueError, match="CSV/parquet"):
        read_xlsx_rows(p, max_bytes=10)
