"""Turn-key reference-shape pipeline: raw signaling TSV → every
analytics product the reference computes, as partitioned parquet.

One call replaces the reference's five hand-run scripts
(ppl_days.py → region.py → cal_orig_area.py → cal_user_trace.py →
cal_mobility_matrix.py / cal_subarea_portion.py); each stage is the
corresponding operator from this package, so the whole flow is
Catalyst plans end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import (
    assign_poi_type,
    assign_region,
    build_region_dim,
    gap_fill_edges,
    home_location,
    od_fractions,
    od_matrix,
)
from .operators.occupancy import record_occupancy
from .operators.stays import dwell_stats, stay_segments
from .sources import read_pings_tsv, read_poi_csv, write_partitioned_parquet


def run_pipeline(
    spark: SparkSession,
    pings_tsv: str,
    poi_csv: str | None,
    out_root: str,
    poi_df: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Execute the full flow; returns the product DataFrames (also
    written under ``out_root``). ``poi_df`` may be passed directly in
    place of a CSV path (tests / alternative sources)."""
    # 1. ETL: typed TSV → date-partitioned parquet (ppl_days.py)
    raw = read_pings_tsv(spark, pings_tsv)
    write_partitioned_parquet(raw, f"{out_root}/pings")
    pings = spark.read.parquet(f"{out_root}/pings")

    # 2. region dimension (region.py) + assignment (cal_orig_area.py)
    poi = poi_df if poi_df is not None else read_poi_csv(spark, poi_csv)
    dim = build_region_dim(poi)
    assigned = assign_region(pings, dim)
    assigned = assign_poi_type(assigned, dim)

    # 3. hourly positions + gap-filled trajectory (cal_mobility_matrix.py)
    pos = (
        assigned.withColumn("hour", F.date_trunc("hour", "ts"))
        .groupBy(F.col("imei_id").alias("user_id"), "hour")
        .agg(
            F.max_by("region_id", F.struct("ts", "imei_id")).alias("region_id"),
            F.max_by("poi_type", F.struct("ts", "imei_id")).alias("poi_type"),
        )
    )
    edges = gap_fill_edges(pos.select("user_id", "hour", "region_id"))

    products: dict[str, DataFrame] = {}
    products["occupancy"] = record_occupancy(edges)
    products["od_matrix"] = od_matrix(edges)
    products["od_fractions"] = od_fractions(products["od_matrix"])
    products["home"] = home_location(
        assigned.select(F.col("imei_id").alias("user_id"), "ts", "region_id")
    )
    # per-POI-type occupancy (cal_subarea_portion.py product)
    products["type_occupancy"] = pos.groupBy("region_id", "poi_type", "hour").agg(
        F.count("*").alias("n_users")
    )
    products["stays"] = stay_segments(pos.select("user_id", "hour", "region_id"))
    products["dwell_stats"] = dwell_stats(products["stays"])

    for name, df in products.items():
        df.write.mode("overwrite").parquet(f"{out_root}/{name}")
    return products
