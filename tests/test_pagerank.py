"""PageRank operator: known-graph values, dangling handling, mass
conservation, and checkpoint-cadence invariance."""

from __future__ import annotations

import pytest

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.pagerank import (
    normalized_edges,
    pagerank,
)

EDGE_SCHEMA = "src int, dst int, w double"


def test_symmetric_cycle_is_uniform(spark):
    """A→B→A: symmetry forces rank 0.5/0.5 at every iteration."""
    edges = spark.createDataFrame([(1, 2, 1.0), (2, 1, 1.0)], EDGE_SCHEMA)
    got = {r.node: r.rank for r in pagerank(edges, iterations=5).collect()}
    assert got == {1: 0.5, 2: 0.5}


def test_star_graph_ranks_hub_highest_and_conserves_mass(spark):
    """Spokes all point at the hub; hub's rank must dominate, and the
    dangling-hub self-loop keeps total mass at 1."""
    spokes = [(i, 0, 1.0) for i in range(1, 6)]  # 5 spokes → hub 0
    edges = spark.createDataFrame(spokes, EDGE_SCHEMA)
    got = {r.node: r.rank for r in pagerank(edges, iterations=10).collect()}
    assert max(got, key=got.get) == 0
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    # spokes are symmetric: identical ranks
    assert len({got[i] for i in range(1, 6)}) == 1


def test_checkpoint_cadence_does_not_change_values(spark):
    edges = spark.createDataFrame(
        [(1, 2, 0.5), (1, 3, 0.5), (2, 3, 1.0), (3, 1, 1.0)], EDGE_SCHEMA
    )
    a = {r.node: r.rank for r in pagerank(edges, 7, checkpoint_every=1).collect()}
    b = {r.node: r.rank for r in pagerank(edges, 7, checkpoint_every=None).collect()}
    assert a == b


def test_normalized_edges_sums_to_one_per_src(spark):
    raw = spark.createDataFrame(
        [(1, 2, 3), (1, 3, 1), (1, 2, 2), (2, 1, 7)],
        "src int, dst int, cnt int",
    )
    rows = normalized_edges(raw).collect()
    got = {(r.src, r.dst): r.w for r in rows}
    assert got[(1, 2)] == pytest.approx(5 / 6, abs=1e-12)
    assert got[(1, 3)] == pytest.approx(1 / 6, abs=1e-12)
    assert got[(2, 1)] == 1.0
    by_src: dict[int, float] = {}
    for (s, _), w in got.items():
        by_src[s] = by_src.get(s, 0.0) + w
    for s, tot in by_src.items():
        assert tot == pytest.approx(1.0, abs=1e-9)
