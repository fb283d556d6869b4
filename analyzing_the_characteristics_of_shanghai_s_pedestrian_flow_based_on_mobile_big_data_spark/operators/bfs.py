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
    edges = edges.localCheckpoint(eager=False)
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
            .localCheckpoint(eager=False)
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


# Exact integer weights 12/d for hop distances 1..4 (12 = lcm(1..4)):
# harmonic centrality becomes Σ (12/d) / 12 — a BIGINT numerator and
# ONE IEEE division, instead of an association-order-dependent sum of
# 1/d doubles.
_HARMONIC_MAX_HOPS = 4
_HARMONIC_WEIGHTS = {1: 12, 2: 6, 3: 4, 4: 3}


def multi_source_hops(
    edges: DataFrame, max_hops: int = _HARMONIC_MAX_HOPS
) -> DataFrame:
    """All-pairs hop distances within ``max_hops``: the bfs_hops relax
    loop keyed by (source, node) — every node is its own 0-hop seed,
    so ONE fixed chain of |rounds| join+min passes replaces |V|
    separate traversals. Returns (source, node, hops), self rows
    included at 0.

    Scale shape: the per-round shuffle is O(|E| · avg frontier), keyed
    on node ids; state is the (source, node) distance table — the
    quadratic all-pairs table only materializes to the extent the
    graph is actually connected within the budget, and the operator is
    meant for node-bounded graphs (regions, clusters), not raw-entity
    graphs."""
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .select(F.col("node").cast("int").alias("node"))
    )
    dist = nodes.select(
        F.col("node").alias("source"), "node"
    ).withColumn("hops", F.lit(0))
    for _ in range(max_hops):
        cand = edges.join(
            dist.withColumnRenamed("node", "src"), "src"
        ).select(
            "source",
            F.col("dst").cast("int").alias("node"),
            (F.col("hops") + 1).alias("hops"),
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("source", "node")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint(eager=False)
        )
    return dist


def harmonic_centrality(
    edges: DataFrame, max_hops: int = _HARMONIC_MAX_HOPS
) -> DataFrame:
    """Harmonic centrality H(v) = Σ_{u≠v reached} 1/d(u→v) within the
    fixed hop budget — the centrality that handles disconnection
    gracefully (unreached pairs contribute 0, no ∞ bookkeeping).
    Exact form: integer weights 12/d summed as BIGINT, one final
    division by 12. Returns (node, n_reached, harmonic)."""
    if max_hops != _HARMONIC_MAX_HOPS:
        raise ValueError("exact weights are precomputed for max_hops=4")
    d = multi_source_hops(edges, max_hops).filter(F.col("hops") > 0)
    w = F.col("hops")
    weight = (
        F.when(w == 1, F.lit(12))
        .when(w == 2, F.lit(6))
        .when(w == 3, F.lit(4))
        .otherwise(F.lit(3))
        .cast("bigint")
    )
    return d.groupBy("node").agg(
        F.count("*").alias("n_reached"),
        (F.sum(weight).cast("double") / F.lit(12.0)).alias("harmonic"),
    )


def harmonic_oracle_sql(
    graph_cte: str, max_hops: int = _HARMONIC_MAX_HOPS
) -> str:
    """Unrolled multi-source twin over ``graph(src, dst)`` +the exact
    integer-weight harmonic aggregation."""
    assert max_hops == _HARMONIC_MAX_HOPS
    parts = [
        graph_cte,
        """
        m0 AS MATERIALIZED (
          SELECT CAST(n AS INTEGER) AS source, CAST(n AS INTEGER) AS node,
                 0 AS hops
          FROM (
            SELECT DISTINCT src AS n FROM graph
            UNION SELECT dst FROM graph
          )
        )""",
    ]
    for r in range(1, max_hops + 1):
        parts.append(
            f"""
        m{r} AS MATERIALIZED (
          SELECT source, node, min(hops) AS hops FROM (
            SELECT source, node, hops FROM m{r - 1}
            UNION ALL
            SELECT d.source, CAST(e.dst AS INTEGER) AS node,
                   d.hops + 1 AS hops
            FROM graph e JOIN m{r - 1} d ON e.src = d.node
          ) GROUP BY source, node
        )"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
        SELECT CAST(node AS INTEGER) AS node,
               count(*) AS n_reached,
               CAST(sum(CASE hops WHEN 1 THEN 12 WHEN 2 THEN 6
                        WHEN 3 THEN 4 ELSE 3 END) AS DOUBLE) / 12.0
                 AS harmonic
        FROM m{max_hops}
        WHERE hops > 0
        GROUP BY node
        """
    )


def closeness_centrality(
    edges: DataFrame, max_hops: int = _HARMONIC_MAX_HOPS
) -> DataFrame:
    """Closeness centrality within the fixed hop budget, exact-integer
    form: C(v) = n_reached / Σ d(u→v) over pairs reached within
    ``max_hops`` (the bounded-horizon closeness that, like harmonic,
    needs no ∞ bookkeeping on disconnected graphs). n_reached and the
    distance sum are exact BIGINTs off the same multi-source relax
    table harmonic centrality uses; the single final division is the
    only float op, so both engines produce identical doubles. Returns
    (node, n_reached, total_hops, closeness)."""
    d = multi_source_hops(edges, max_hops).filter(F.col("hops") > 0)
    return d.groupBy("node").agg(
        F.count("*").alias("n_reached"),
        F.sum("hops").cast("bigint").alias("total_hops"),
        (
            F.count("*").cast("double")
            / F.sum("hops").cast("double")
        ).alias("closeness"),
    )


def closeness_oracle_sql(
    graph_cte: str, max_hops: int = _HARMONIC_MAX_HOPS
) -> str:
    """Unrolled multi-source twin of :func:`closeness_centrality` —
    the harmonic CTE chain with the closeness aggregation."""
    parts = [
        graph_cte,
        """
        m0 AS MATERIALIZED (
          SELECT CAST(n AS INTEGER) AS source, CAST(n AS INTEGER) AS node,
                 0 AS hops
          FROM (
            SELECT DISTINCT src AS n FROM graph
            UNION SELECT dst FROM graph
          )
        )""",
    ]
    for r in range(1, max_hops + 1):
        parts.append(
            f"""
        m{r} AS MATERIALIZED (
          SELECT source, node, min(hops) AS hops FROM (
            SELECT source, node, hops FROM m{r - 1}
            UNION ALL
            SELECT d.source, CAST(e.dst AS INTEGER) AS node,
                   d.hops + 1 AS hops
            FROM graph e JOIN m{r - 1} d ON e.src = d.node
          ) GROUP BY source, node
        )"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
        SELECT CAST(node AS INTEGER) AS node,
               count(*) AS n_reached,
               CAST(sum(hops) AS BIGINT) AS total_hops,
               CAST(count(*) AS DOUBLE) / CAST(sum(hops) AS DOUBLE)
                 AS closeness
        FROM m{max_hops}
        WHERE hops > 0
        GROUP BY node
        """
    )
