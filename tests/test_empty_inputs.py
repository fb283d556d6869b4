"""Empty-input robustness: every query must run (and return zero rows)
on zero-row tables.

At 100 TB, empty slices are routine — a new date partition, a filtered
source, a cold-start stream backfill. An operator that assumes rows
exist (a collect()[0], an untyped empty literal, a head-based schema
probe) fails precisely when the pipeline is first wired up. This gate
runs the FULL batch query surface against empty copies of all ten tables.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources.tables import (
    load_table,
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(0).write.mode(
            "overwrite"
        ).parquet(f"{d}/{t}.parquet")
    return d


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, fn in entrymod.queries().items():
        if name == "streaming_occupancy":
            continue  # streaming query; covered by its own harness
        try:
            rows = fn(spark, empty_sf_dir).limit(5).collect()
        except Exception as ex:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:120]}")
            continue
        if name == "data_quality_profile":
            # a profile of an empty table IS rows (n_rows=0, NULL
            # ratios) — that's the operator's contract, like Deequ;
            # assert the zero-row fact is reported, not hidden
            vals = {(r.col_name, r.metric): r.value for r in rows}
            if vals.get(("*", "n_rows")) != 0.0:
                failures.append(f"{name}: empty table not profiled as 0 rows")
            continue
        if name == "bloom_membership_report":
            # ungrouped one-row report: an empty corpus IS reportable
            # (0 users, 0 members, 0 FPs); the DuckDB twin agrees
            if len(rows) != 1 or rows[0].n_users != 0 or rows[0].n_members != 0:
                failures.append(f"{name}: empty corpus not reported as zeros")
            continue
        if name in ("q19_disjunctive_revenue", "q17_small_qty_revenue"):
            # ungrouped global aggregates: one (NULL sum, 0 count) row
            # IS the correct report of an empty fact table — the
            # DuckDB twins produce the identical single row
            if len(rows) != 1 or rows[0].n_lineitems != 0:
                failures.append(f"{name}: empty input not reported as 0 lineitems")
            continue
        if name == "q6_forecast_revenue":
            # same ungrouped-global-aggregate contract as q17/q19
            if len(rows) != 1 or rows[0].n_lines != 0:
                failures.append(f"{name}: empty input not reported as 0 lines")
            continue
        if name == "ivf_health_report":
            # one-row health report (round 9): an empty index yields
            # the row the SQL twin's ungrouped final aggregate
            # produces — 0 lists, NULL shares/cos/recenter (there is
            # no hottest list to compare to a threshold)
            if (
                len(rows) != 1
                or rows[0].n_lists != 0
                or rows[0].max_list_share is not None
            ):
                failures.append(
                    f"{name}: empty index not reported as 0 lists"
                )
            continue
        if name == "graph_summary_stats":
            # one-row health report: an EMPTY graph is itself a
            # reportable fact (0 nodes / 0 edges), the
            # data_quality_profile contract — assert it reports the
            # zeros rather than hiding them (the DuckDB twin's
            # ungrouped aggregate also yields exactly one row)
            if len(rows) != 1 or rows[0].n_nodes != 0 or rows[0].n_directed_edges != 0:
                failures.append(f"{name}: empty graph not reported as 0 nodes/edges")
            continue
        if rows:
            failures.append(f"{name}: produced {len(rows)} rows from empty input")
    assert not failures, "\n".join(failures)
