"""Community detection — synchronous weighted label propagation (LPA).

Completes the graph-analytics family (components = connectivity,
PageRank = centrality, triangles = local density) with mesoscale
structure: which groups of OD regions exchange more flow internally
than externally. LPA is the standard scalable community algorithm —
no objective function to optimize, just local label agreement — and
its synchronous, deterministically tie-broken variant is expressible
as a fixed chain of joins + aggregates, so (like PageRank, unlike
components' data-dependent loop) it carries a full unrolled DuckDB
twin under the value-hash gate.

Update rule, per round, for every node v:

    label(v) ← the label ℓ maximizing  Σ w(u,v) over neighbors u with
               label(u) = ℓ;   ties → smallest ℓ;   isolated nodes
               keep their label.

Determinism: integer edge weights, total (score desc, label asc)
order via row_number. Synchronous update (all nodes flip together
from the previous round's labels) — the asynchronous variant is
order-dependent and cannot be oracle-checked.

Scale shape: each round is ONE hash join (directed-edge table ⋈
labels on src) + ONE map-side-combinable aggregate (dst, label) +
ONE users-sized window — all keyed on node ids, AQE-skew-safe. The
edge table is eager-localCheckpointed once up front and labels are
checkpointed per round (the components.py / pagerank.py lineage
lesson: without truncation round k re-derives the whole upstream
pipeline k times). Fixed round count keeps the plan static; LPA
empirically stabilizes in ≤5 rounds on most graphs.

No counterpart in the reference (no graph code there) — engine
breadth, SURVEY.md §2 extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def undirected_weighted_edges(edges: DataFrame) -> DataFrame:
    """(src, dst, w) directed multigraph → undirected simple weighted
    edges (u < v, w = Σ both directions), self-loops dropped."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.col("w"),
        )
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
    )


def label_propagation(edges: DataFrame, rounds: int = 4) -> DataFrame:
    """Run ``rounds`` synchronous weighted-LPA updates over the
    undirected simplification of ``edges`` (src, dst, w — integer
    weights). Returns (node, community) where community is the final
    label (labels are initialized to the node id, so a community id is
    the id of one of its members)."""
    und = undirected_weighted_edges(edges)
    # both directions once, so each round is a single src-keyed join
    nbr = (
        und.select(
            F.col("u").alias("src"), F.col("v").alias("dst"), "w"
        )
        .unionByName(
            und.select(
                F.col("v").alias("src"), F.col("u").alias("dst"), "w"
            )
        )
        .localCheckpoint(eager=False)
    )
    nodes = nbr.select(F.col("src").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint(
        eager=False
    )
    rank_w = Window.partitionBy("dst").orderBy(
        F.col("score").desc(), F.col("label").asc()
    )
    for _ in range(rounds):
        scores = (
            nbr.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy("dst", "label")
            .agg(F.sum("w").alias("score"))
        )
        winner = (
            scores.withColumn("rn", F.row_number().over(rank_w))
            .filter(F.col("rn") == 1)
            .select(F.col("dst").alias("node"), "label")
        )
        # isolated nodes (none here once self-loops are dropped from a
        # connected OD graph, but contractually): keep current label
        labels = (
            labels.select("node", F.col("label").alias("__old"))
            .join(winner, "node", "left")
            .select(
                "node", F.coalesce("label", "__old").alias("label")
            )
            .localCheckpoint(eager=False)
        )
    return labels.select("node", F.col("label").alias("community"))


def lpa_oracle_sql(graph_cte: str, rounds: int = 4) -> str:
    """DuckDB twin: the same synchronous updates as unrolled CTEs over
    the ``graph(src, dst, w)`` relation defined by ``graph_cte`` —
    MATERIALIZED like the PageRank twin so DuckDB computes each round
    once, not once per reference."""
    parts = [
        graph_cte,
        """
        und AS MATERIALIZED (
          SELECT least(src, dst) AS u, greatest(src, dst) AS v,
                 sum(w) AS w
          FROM graph WHERE src <> dst GROUP BY 1, 2
        ),
        nbr AS MATERIALIZED (
          SELECT u AS src, v AS dst, w FROM und
          UNION ALL
          SELECT v AS src, u AS dst, w FROM und
        ),
        lab0 AS MATERIALIZED (
          SELECT DISTINCT src AS node, src AS label FROM nbr
        )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""
        lab{r} AS MATERIALIZED (
          SELECT p.node, coalesce(w.label, p.label) AS label
          FROM lab{r - 1} p
          LEFT JOIN (
            SELECT dst AS node, label FROM (
              SELECT nbr.dst, l.label, sum(nbr.w) AS score,
                     row_number() OVER (
                       PARTITION BY nbr.dst
                       ORDER BY sum(nbr.w) DESC, l.label ASC) AS rn
              FROM nbr JOIN lab{r - 1} l ON l.node = nbr.src
              GROUP BY nbr.dst, l.label
            ) WHERE rn = 1
          ) w ON w.node = p.node
        )"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
        SELECT CAST(node AS INTEGER) AS node,
               CAST(label AS INTEGER) AS community
        FROM lab{rounds}
        """
    )
