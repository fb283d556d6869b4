"""Dump .explain("formatted") for named queries into per-query files —
the round-15 optimization evidence trail. Usage:

    python tools/dump_plan_files.py <suffix> <query> [query ...]

writes plans/r15/<query>_<suffix>.txt for each query (suffix is
"before" or "after"). Plans are built at $SPARK_GRAFT_SF_DIR
(default sf0.1 — the bench scale, so split counts match the bench).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.session import (
    get_spark,
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("shflow-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        if name not in qs:
            print(f"{name}: not in registry", file=sys.stderr)
            continue
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"wrote {path} ({n_ex} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
