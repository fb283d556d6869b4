"""Scale probe: replicate the events table N× (disjoint user-id
spaces) and measure the headline trajectory chain, to check that
runtime grows ~linearly with input and the plan shape holds.

Usage: python tools/scale_probe.py [N] [sf_dir]
Writes the scaled table to /tmp and prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark import (
    operators as ops,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.session import (
    get_spark,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
    load_events,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_events(spark, sf_dir)
    copies = base.crossJoin(
        spark.range(n).select(F.col("id").alias("rep"))
    ).select(
        (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
        "ts",
        "event_type",
        "event_id",
        "value",
    )
    out = os.path.join(tempfile.gettempdir(), f"events_x{n}.parquet")
    copies.write.mode("overwrite").parquet(out)
    scaled = spark.read.parquet(out)
    n_rows = scaled.count()

    pings = scaled.select(
        "user_id",
        "ts",
        F.date_trunc("hour", "ts").alias("hour"),
        (F.pmod(F.floor("value").cast("long"), F.lit(20)) + 1)
        .cast("int")
        .alias("region_id"),
        "event_id",
    )

    results = {"replication": n, "rows": n_rows}
    t0 = time.perf_counter()
    pos = ops.hourly_positions(pings)
    pos.write.format("noop").mode("overwrite").save()
    results["hourly_positions_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    edges = ops.gap_fill_edges(ops.hourly_positions(pings))
    edges.write.format("noop").mode("overwrite").save()
    results["gap_fill_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    frac = ops.od_fractions(
        ops.od_matrix(ops.gap_fill_edges(ops.hourly_positions(pings)))
    )
    frac.write.format("noop").mode("overwrite").save()
    results["od_fractions_s"] = round(time.perf_counter() - t0, 2)

    # documents chain: corpus-hygiene operators on an N×-replicated
    # corpus (disjoint doc_id spaces, identical text — worst-case hit
    # density for the decontamination join)
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.functions.text import (
        token_count,
    )
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.decontam import (
        decontaminate,
    )
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.packing import (
        pack_sequences,
        pack_stats,
    )
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    dcopies = docs.crossJoin(
        spark.range(n).select(F.col("id").alias("rep"))
    ).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    dout = os.path.join(tempfile.gettempdir(), f"documents_x{n}.parquet")
    dcopies.write.mode("overwrite").parquet(dout)
    sdocs = spark.read.parquet(dout)

    t0 = time.perf_counter()
    decontaminate(sdocs, F.pmod(F.col("doc_id"), F.lit(50)) == 0, n=8).write.format(
        "noop"
    ).mode("overwrite").save()
    results["decontam_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    pack_stats(
        pack_sequences(
            sdocs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))
        )
    ).write.format("noop").mode("overwrite").save()
    results["packing_s"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
