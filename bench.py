"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced through a full materialization (noop sink) so
timings include every operator, not just the count path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.session import (
    get_spark,
)

HEADLINE = [
    "occupancy_by_region_hour",
    "trajectory_gap_fill",
    "od_fractions",
    "home_location",
    "pricing_summary",
    "revenue_by_brand",
    "top_orders_per_customer",
    "exact_dedup_docs",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "sessionization",
    "text_stats",
    "cosine_topk",
    "ann_bucketed",
    # iterative and composed pipelines — round-over-round perf tracking
    # must cover more than single-pass queries
    "near_dup_clusters",
    "corpus_curation",
    "od_weekly_cycle",
    # late round-2 pipeline operators
    "benchmark_decontam",
    "ivf_topk",
    "sequence_packing",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("shflow-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]

    # warm the JVM/session once (tiny query, not timed)
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # two measured iterations per query, report the min (steady-state:
    # first run pays codegen/plan compile; the repeat is what a resident
    # engine would serve)
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
