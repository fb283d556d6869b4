"""Triangle counting: known graphs, multigraph/self-loop tolerance."""

from __future__ import annotations

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.triangles import (
    triangle_counts,
    undirected_simple_edges,
)

SCHEMA = "src int, dst int"


def test_k4_every_node_in_three_triangles(spark):
    edges = [(a, b) for a in range(4) for b in range(4) if a != b]
    got = {
        r.node: r.n_tri
        for r in triangle_counts(spark.createDataFrame(edges, SCHEMA)).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_path_graph_has_no_triangles(spark):
    edges = [(0, 1), (1, 2), (2, 3)]
    out = triangle_counts(spark.createDataFrame(edges, SCHEMA)).collect()
    assert out == []


def test_single_triangle_with_pendant(spark):
    # triangle 0-1-2 plus pendant 3 hanging off node 2; duplicate and
    # reversed edges and a self-loop must not change the answer
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (2, 3), (3, 3)]
    df = spark.createDataFrame(edges, SCHEMA)
    assert undirected_simple_edges(df).count() == 4
    got = {r.node: r.n_tri for r in triangle_counts(df).collect()}
    assert got == {0: 1, 1: 1, 2: 1}
