"""Breadth-first traversal — fixed-round frontier expansion.

The graph-traversal class (reachability, hop distance) that rounds
out components/PageRank/LPA/triangles: dist(source)=0, and each
round relaxes dist(v) = min(dist(v), min over in-edges (u,v) of
dist(u)+1). With a FIXED round budget the plan is a static chain —
like PageRank and unlike components' data-dependent loop — so it
carries a full unrolled DuckDB twin under the value-hash gate.
``max_hops`` bounds the radius explicitly (the iteration-count /
convergence trade every distributed BFS makes; Pregel stops on an
empty frontier, we stop at the budget and the budget is part of the
query's contract).

Scale shape: each round is ONE hash join (edges ⋈ dist on src) + ONE
map-side-combinable min() aggregate, both keyed on node ids. Edges
are checkpointed once, dist per round (lineage truncation — the
pagerank.py:88-94 lesson). Shuffle payload per round is
O(|frontier-adjacent edges|), never all-pairs.

The OD region graph is near-complete (every hop distance would be
0/1 — vacuous), so the paired query sparsifies deterministically
first: keep each node's top-``k`` strongest out-edges (ties broken
on dest id) — the standard k-NN-graph construction, itself a
windowed top-k per group that mirrors 1:1 into SQL.

No counterpart in the reference — engine breadth (SURVEY.md §2
extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_out_edges(edges: DataFrame, k: int = 3) -> DataFrame:
    """(src, dst, w) → each node's ``k`` strongest out-edges
    (w desc, dst asc; self-loops dropped) — deterministic k-NN-graph
    sparsification."""
    w_rank = Window.partitionBy("src").orderBy(
        F.col("w").desc(), F.col("dst").asc()
    )
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= k)
        .select("src", "dst")
    )


def bfs_hops(
    edges: DataFrame, source: int, max_hops: int = 6
) -> DataFrame:
    """Hop distance from ``source`` over the directed (src, dst)
    graph, relaxed for exactly ``max_hops`` rounds. Returns
    (node, hops); nodes not reached within the budget are absent, and
    a ``source`` absent from the graph's node set yields an empty
    result (so an empty edge table stays empty — no phantom row)."""
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    dist = (
        nodes.filter(F.col("node") == source)
        .select(F.col("node").cast("int").alias("node"))
        .withColumn("hops", F.lit(0))
    )
    for _ in range(max_hops):
        cand = (
            edges.join(dist.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("hops") + 1).alias("hops"),
            )
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint(eager=True)
        )
    return dist


def bfs_oracle_sql(graph_cte: str, source: int, max_hops: int = 6) -> str:
    """Unrolled DuckDB twin over the ``graph(src, dst)`` relation
    defined by ``graph_cte`` — MATERIALIZED per round (the PageRank
    CTE-inlining lesson)."""
    parts = [
        graph_cte,
        f"""
        d0 AS MATERIALIZED (
          SELECT CAST(n AS INTEGER) AS node, 0 AS hops FROM (
            SELECT DISTINCT src AS n FROM graph
            UNION SELECT dst FROM graph
          ) WHERE n = {source}
        )""",
    ]
    for r in range(1, max_hops + 1):
        parts.append(
            f"""
        d{r} AS MATERIALIZED (
          SELECT node, min(hops) AS hops FROM (
            SELECT node, hops FROM d{r - 1}
            UNION ALL
            SELECT e.dst AS node, d.hops + 1 AS hops
            FROM graph e JOIN d{r - 1} d ON e.src = d.node
          ) GROUP BY node
        )"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
        SELECT CAST(node AS INTEGER) AS node,
               CAST(hops AS INTEGER) AS hops
        FROM d{max_hops}
        """
    )
