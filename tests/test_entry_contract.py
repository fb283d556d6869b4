"""Meta-tests of the driver contract itself — guards against the
failure modes that bite silently: key asymmetry between queries() and
oracle_sql(), non-callable entries (dict-shadowing accidents),
duplicate output columns (breaks the driver's column-sorted hash), and
unstable schemas across invocations."""

from __future__ import annotations

import __spark_entry__ as entrymod

from conftest import SF_SMALL


def test_every_oracle_has_a_query():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))


def test_all_query_entries_callable():
    assert all(callable(f) for f in entrymod.queries().values())


def test_rows_only_queries_are_intentional():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    # Only these may lack an oracle (approx results / no SQL equivalent);
    # geohash_cells graduated to an oracle pair when the encode went
    # JVM-native with a generated SQL twin. subsumption_prune_fixpoint
    # (round 10) is rows-only BY DESIGN: the domination-DAG kernel is
    # non-monotone well-founded recursion no single SQL statement or
    # monotone recursive CTE can express; its correctness is pinned by
    # the planted-chain pytest and greedy-parity on chain-free corpora.
    assert sorted(set(q) - set(o)) == [
        "occupancy_approx",
        "subsumption_prune_fixpoint",
        "value_percentiles_approx",
    ]


def test_schemas_stable_and_no_duplicate_columns(spark):
    qs = entrymod.queries()
    for name, fn in qs.items():
        if name == "streaming_occupancy":
            continue  # exercised in its own test; slow to run twice
        df1 = fn(spark, SF_SMALL)
        cols = df1.columns
        assert len(cols) == len(set(cols)), f"{name}: duplicate columns {cols}"
        df2 = fn(spark, SF_SMALL)
        assert df1.schema == df2.schema, f"{name}: unstable schema"
