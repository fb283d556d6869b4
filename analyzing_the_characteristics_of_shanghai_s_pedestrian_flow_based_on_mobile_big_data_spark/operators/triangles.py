"""Triangle counting — degree-ordered wedge join.

Graph-analytics breadth beyond components/PageRank: how many
triangles does each node of the (undirected) OD region graph close?
Triangle density separates hub-and-spoke mobility from clique-like
neighborhoods.

The naive 3-way self-join explodes on high-degree nodes (a degree-d
hub contributes d² wedges). The standard fix — and the reason this
operator scales — is *degree orientation*: rank nodes by (degree,
node), orient every undirected edge from the lower-ranked to the
higher-ranked endpoint, and join wedges only in that DAG. Every
triangle then appears EXACTLY once (as its unique rank-sorted triple),
and each node's oriented out-degree is O(√|E|) on any graph, bounding
the wedge table at |E|^1.5 instead of Σd² — the difference between
feasible and not on power-law graphs.

All joins are equi-joins on node keys (shuffle- and AQE-skew-safe);
the per-node counts come from one explode of each triangle's three
corners. Deterministic: integer degrees, total (degree, node) order —
the DuckDB twin mirrors the orientation literally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_simple_edges(edges: DataFrame) -> DataFrame:
    """(src, dst) directed multigraph → distinct undirected simple
    edges (u < v), self-loops dropped."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over the undirected
    simplification of ``edges`` (src, dst). Output: (node, n_tri) —
    nodes in no triangle are absent (join with the node set and
    zero-fill downstream if a dense vector is needed)."""
    # Materialize the simplified edge set ONCE: it feeds the degree
    # table twice and (via oriented) three join legs; without
    # truncation every reference re-derives the full upstream pipeline
    # that produced the edges (measured ~14 s → pagerank-ballpark at
    # sf0.01 on the OD graph — same lesson as pagerank.py:88-94).
    und = undirected_simple_edges(edges).localCheckpoint(eager=True)
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # orient: lower (degree, node) -> higher (degree, node)
    du = deg.select(
        F.col("node").alias("u"), F.col("deg").alias("du")
    )
    dv = deg.select(
        F.col("node").alias("v"), F.col("deg").alias("dv")
    )
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("lo"), F.col("v").alias("hi")),
            )
            .otherwise(
                F.struct(F.col("v").alias("lo"), F.col("u").alias("hi"))
            )
            .alias("e")
        )
        .select(F.col("e.lo").alias("lo"), F.col("e.hi").alias("hi"))
        # oriented feeds three join legs (e1, e2, closing) — checkpoint
        # so the degree join + orientation compute once, not thrice
        .localCheckpoint(eager=True)
    )
    # wedges from a shared low endpoint; close with the third edge
    e1 = oriented.select(
        F.col("lo").alias("a"), F.col("hi").alias("b")
    )
    e2 = oriented.select(
        F.col("lo").alias("a"), F.col("hi").alias("c")
    )
    # b "before" c in the orientation's total order is enforced by
    # joining the closing edge b->c (which only exists when rank(b) <
    # rank(c)), so no wedge dedup predicate is needed beyond b != c
    wedges = e1.join(e2, "a").filter(F.col("b") != F.col("c"))
    closing = oriented.select(
        F.col("lo").alias("b"), F.col("hi").alias("c")
    )
    tris = wedges.join(closing, ["b", "c"])
    corners = (
        tris.select(F.col("a").alias("node"))
        .unionByName(tris.select(F.col("b").alias("node")))
        .unionByName(tris.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_tri"))


# CTE block (und/deg/oriented/tris) without the final select —
# composable by downstream oracles (clustering coefficient); the
# TEMPLATE below keeps the original per-node-count contract.
TRIANGLE_ORACLE_CTES = """
        und AS (
          SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
          FROM graph WHERE src <> dst
        ),
        deg AS (
          SELECT node, count(*) AS deg FROM (
            SELECT u AS node FROM und UNION ALL SELECT v FROM und
          ) GROUP BY node
        ),
        oriented AS (
          SELECT CASE WHEN (du.deg < dv.deg)
                        OR (du.deg = dv.deg AND e.u < e.v)
                      THEN e.u ELSE e.v END AS lo,
                 CASE WHEN (du.deg < dv.deg)
                        OR (du.deg = dv.deg AND e.u < e.v)
                      THEN e.v ELSE e.u END AS hi
          FROM und e
          JOIN deg du ON du.node = e.u
          JOIN deg dv ON dv.node = e.v
        ),
        tris AS (
          SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
          FROM oriented e1
          JOIN oriented e2 ON e2.lo = e1.lo AND e2.hi <> e1.hi
          JOIN oriented e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
        )
"""

TRIANGLE_ORACLE_TEMPLATE = (
    TRIANGLE_ORACLE_CTES
    + """
        SELECT CAST(node AS INTEGER) AS node, count(*) AS n_tri FROM (
          SELECT a AS node FROM tris
          UNION ALL SELECT b FROM tris
          UNION ALL SELECT c FROM tris
        ) GROUP BY 1
"""
)
