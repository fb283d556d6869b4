"""Per-query cost split: DataFrame build vs analyze+optimize+codegen
vs execution (noop sink). The bench re-builds the DataFrame every
timed pass (same methodology as the driver), so plan-side time is
part of the measured number — this tool tells us, per query, whether
to attack the expression tree (plan-side) or the physical plan
(exec-side). Usage:

    python tools/profile_split.py <query> [query ...]          # sf0.1
    SPARK_GRAFT_SF_DIR=... python tools/profile_split.py ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.session import (
    get_spark,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("shflow-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = sys.argv[1:]
    iters = int(os.environ.get("PROF_ITERS", "3"))
    print(f"{'query':35s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'total':>7s}")
    for name in names:
        if name not in qs:
            print(f"{name}: not in registry", file=sys.stderr)
            continue
        # one full warm-up pass (codegen cache, shuffle files)
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        bs, ps, es = [], [], []
        for _ in range(iters):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()  # analyze+optimize+plan
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            bs.append(t1 - t0)
            ps.append(t2 - t1)
            es.append(t3 - t2)
        bs.sort(), ps.sort(), es.sort()
        b, p, e = bs[iters // 2], ps[iters // 2], es[iters // 2]
        print(f"{name:35s} {b:7.3f} {p:7.3f} {e:7.3f} {b+p+e:7.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
