"""Connected components over a pair table — near-dup cluster assembly.

Dedup pipelines need the transitive closure of the pairwise matches
(exact, MinHash, SimHash): if a~b and b~c, all three share one
canonical id. Implemented as iterative minimum-label propagation —
each round, every node adopts the smallest label in its neighborhood;
converges in O(diameter) rounds. Per round: one join + one aggregate,
both on the node key — the standard large-graph Spark pattern (no
GraphX dependency, no python).

At 100 TB scale the round count stays small because near-dup clusters
are shallow (most are pairs/triangles); checkpoint the label table
every few rounds to truncate lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node in the pair table; component =
    smallest node id reachable. ``pairs`` is undirected input."""
    edges = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .unionByName(
            pairs.select(F.col(b_col).alias("a"), F.col(a_col).alias("b"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
