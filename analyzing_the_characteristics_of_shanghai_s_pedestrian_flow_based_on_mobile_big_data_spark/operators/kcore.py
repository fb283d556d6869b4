"""k-core decomposition — fixed-round peeling.

The degeneracy-based community/cohesion primitive that rounds out the
graph family (components, PageRank, LPA, triangles, BFS): the k-core
is the maximal induced subgraph where every node keeps degree ≥ k.
Computed by PEELING — simultaneously drop all nodes with current
degree < k, recompute degrees on the induced subgraph, repeat. With a
FIXED round budget the plan is a static chain (the bfs.py/pagerank.py
contract), so it carries a full unrolled DuckDB twin under the
value-hash gate; the budget is part of the query contract and peeling
converges when a round removes nobody (monotone: the alive set only
shrinks, so ``rounds ≥ longest peel chain`` gives the exact k-core —
6 covers any 20-node graph's chains at k=4, asserted converged in
tests).

Scale shape per round: one degree aggregate (map-side combinable,
keyed on node) + two semi-joins filtering the edge list to alive
endpoints — all node-keyed hash exchanges, payload O(|E alive|),
shrinking monotonically. Edges checkpointed once, the alive set per
round (lineage truncation).

No counterpart in the reference — engine breadth (SURVEY.md §2
extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame) -> DataFrame:
    """Directed (src, dst) → undirected simple edge set: both
    orientations, self-loops dropped, deduplicated."""
    fwd = edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
    rev = fwd.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return fwd.unionByName(rev).distinct()


def k_core(edges: DataFrame, k: int, rounds: int = 6) -> DataFrame:
    """Nodes of the k-core of the undirected graph ``edges``
    (pre-symmetrized (src, dst), both orientations present) with
    their core-subgraph degree: (node, deg). Peels for exactly
    ``rounds`` rounds."""
    live = edges.localCheckpoint(eager=False)
    for _ in range(rounds):
        deg = live.groupBy("src").agg(F.count("*").alias("deg"))
        alive = deg.filter(F.col("deg") >= k).select(
            F.col("src").alias("node")
        )
        live = (
            live.join(
                alive.select(F.col("node").alias("src")), "src", "semi"
            )
            .join(
                alive.select(F.col("node").alias("dst")), "dst", "semi"
            )
            .localCheckpoint(eager=False)
        )
    return (
        live.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("deg"))
        .filter(F.col("deg") >= k)
    )


def k_core_oracle_sql(graph_cte: str, k: int, rounds: int = 6) -> str:
    """Unrolled DuckDB twin over the undirected ``graph(src, dst)``
    relation defined by ``graph_cte`` (both orientations present) —
    MATERIALIZED per round (the PageRank CTE-inlining lesson)."""
    parts = [graph_cte, "e0 AS MATERIALIZED (SELECT src, dst FROM graph)"]
    for r in range(1, rounds + 1):
        parts.append(
            f"""
        a{r} AS MATERIALIZED (
          SELECT src AS node FROM e{r - 1}
          GROUP BY src HAVING count(*) >= {k}
        ),
        e{r} AS MATERIALIZED (
          SELECT e.src, e.dst FROM e{r - 1} e
          JOIN a{r} x ON e.src = x.node
          JOIN a{r} y ON e.dst = y.node
        )"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
        SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        FROM e{rounds}
        GROUP BY src HAVING count(*) >= {k}
        """
    )
