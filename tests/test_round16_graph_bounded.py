"""Round-16 bounded-domain graph folds: every driver fold must be
bit-identical to its distributed operator twin on the same edge set —
including the decimal/floor-round arithmetic of PageRank and HITS,
the tie-breaks of LPA, and the fixed round budgets."""

from __future__ import annotations

import pytest

pkg = "analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark"

# a small directed weighted multigraph with hubs, chains, a sink,
# an isolated-pair component and asymmetric weights
EDGES = [
    (1, 2, 5), (1, 3, 3), (2, 3, 4), (3, 1, 2), (3, 4, 7),
    (4, 5, 1), (5, 4, 2), (5, 6, 9), (6, 1, 1), (2, 4, 2),
    (7, 8, 3), (8, 7, 3), (4, 4, 5), (1, 2, 1),
]


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "src int, dst int, w int")


def test_pagerank_fold_matches_operator(spark):
    from pyspark.sql import functions as F

    mod = __import__(f"{pkg}.operators.pagerank", fromlist=["*"])
    gb = __import__(f"{pkg}.operators.graph_bounded", fromlist=["*"])

    norm = mod.normalized_edges(
        _edges_df(spark).select("src", "dst", F.col("w").alias("cnt"))
    )
    rows = [(r["src"], r["dst"], r["w"]) for r in norm.collect()]
    want = {
        r.node: r.rank for r in mod.pagerank(norm, iterations=10).collect()
    }
    got = dict(gb.pagerank_fold(rows, iterations=10))
    assert got == want  # exact equality, not approx — same bits


def test_bfs_and_centrality_folds_match_operators(spark):
    bfs = __import__(f"{pkg}.operators.bfs", fromlist=["*"])
    gb = __import__(f"{pkg}.operators.graph_bounded", fromlist=["*"])

    g = _edges_df(spark).select("src", "dst").distinct()
    rows = [(r.src, r.dst) for r in g.collect()]

    want = {
        (r.node, r.hops)
        for r in bfs.bfs_hops(g, source=1, max_hops=6).collect()
    }
    assert set(map(tuple, gb.bfs_hops_fold(rows, 1, 6))) == want
    # absent source
    assert gb.bfs_hops_fold(rows, 99, 6) == []

    want_h = {
        (r.node, r.n_reached, r.harmonic)
        for r in bfs.harmonic_centrality(g, max_hops=4).collect()
    }
    assert set(map(tuple, gb.harmonic_fold(rows, 4))) == want_h

    want_c = {
        (r.node, r.n_reached, r.total_hops, r.closeness)
        for r in bfs.closeness_centrality(g, max_hops=4).collect()
    }
    assert set(map(tuple, gb.closeness_fold(rows, 4))) == want_c


def test_hits_fold_matches_operator(spark):
    hits_mod = __import__(f"{pkg}.operators.hits", fromlist=["*"])
    gb = __import__(f"{pkg}.operators.graph_bounded", fromlist=["*"])

    g = _edges_df(spark).select("src", "dst")
    rows = [(r.src, r.dst) for r in g.collect()]
    for iters in (1, 3, 5):
        want = {
            (r.node, r.hub, r.authority)
            for r in hits_mod.hits(g, iterations=iters).collect()
        }
        assert set(map(tuple, gb.hits_fold(rows, iterations=iters))) == want


def test_kcore_fold_matches_operator(spark):
    kc = __import__(f"{pkg}.operators.kcore", fromlist=["*"])
    gb = __import__(f"{pkg}.operators.graph_bounded", fromlist=["*"])

    sym = kc.symmetrize(_edges_df(spark).select("src", "dst"))
    rows = [(r.src, r.dst) for r in sym.collect()]
    for k in (2, 3):
        want = {
            (r.node, r.deg)
            for r in kc.k_core(sym, k=k, rounds=6).collect()
        }
        assert set(map(tuple, gb.k_core_fold(rows, k=k, rounds=6))) == want


def test_lpa_fold_matches_operator(spark):
    lp = __import__(f"{pkg}.operators.labelprop", fromlist=["*"])
    gb = __import__(f"{pkg}.operators.graph_bounded", fromlist=["*"])

    e = _edges_df(spark)
    want = {
        (r.node, r.community)
        for r in lp.label_propagation(e, rounds=4).collect()
    }
    und = lp.undirected_weighted_edges(e)
    rows = [(r.u, r.v, r.w) for r in und.collect()]
    assert set(map(tuple, gb.label_propagation_fold(rows, rounds=4))) == want


def test_collect_edges_bounded_enforces(spark):
    gb = __import__(f"{pkg}.operators.graph_bounded", fromlist=["*"])
    df = _edges_df(spark)
    with pytest.raises(ValueError, match="domain bound"):
        gb.collect_edges_bounded(df, 3, "src", "dst")
    assert len(gb.collect_edges_bounded(df, 100, "src", "dst")) == len(EDGES)
