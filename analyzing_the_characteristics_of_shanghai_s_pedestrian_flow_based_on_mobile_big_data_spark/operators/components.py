"""Connected components over a pair table — near-dup cluster assembly.

Dedup pipelines need the transitive closure of the pairwise matches
(exact, MinHash, SimHash): if a~b and b~c, all three share one
canonical id. Implemented as iterative minimum-label propagation with
pointer jumping — each round every node adopts the smallest label in
its neighborhood (one join + one agg on the node key), then labels are
shortcut through one pointer-jump self-join (label := label of label).
The jump halves the effective propagation distance per round, so a
component of diameter d converges in O(log d) rounds, not O(d) — the
difference between 7 and 63 rounds on a 64-node chain of near-dups.
No GraphX dependency, no python.

Scale hardening (100 TB):
- superseded label generations are unpersisted as soon as the next
  generation is materialized — the cache holds exactly one generation;
- every ``checkpoint_interval`` rounds the label table is
  ``localCheckpoint``-ed, truncating a plan tree that otherwise grows
  by three joins per round;
- convergence is detected from the label-sum delta (labels are
  monotonically non-increasing integers, so an unchanged sum ⟺ no
  change) — one aggregate job per round on the label table alone, no
  extra join;
- a loop that exits without converging raises (or returns flagged via
  ``strict=False``) instead of silently returning truncated labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Label propagation exhausted max_iterations before converging."""


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 25,
    checkpoint_interval: int = 5,
    strict: bool = True,
) -> DataFrame:
    """(node, component) for every node in the pair table; component =
    smallest node id reachable. ``pairs`` is undirected input.

    With pointer jumping, ``max_iterations`` bounds the *log* of the
    component diameter — 25 rounds cover any graph that fits on disk.
    ``strict=True`` raises :class:`ConvergenceError` if the loop exits
    un-converged (silently truncated labels are wrong labels).
    """
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
        .persist()
    )
    # Decimal sum: overflow-safe for arbitrary long ids at any count.
    sum_expr = F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
    prev_sum = labels.agg(sum_expr).collect()[0]["s"]
    converged = prev_sum is None  # empty input is trivially converged
    for it in range(max_iterations):
        if converged:
            break
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce("nbr_component", F.col("component")),
            ).alias("component"),
        )
        # Pointer jump: component := component's own label. The jump
        # target table is `stepped` itself (freshest labels), keyed on
        # node — one self-join, halves remaining distance.
        jump = stepped.select(
            F.col("node").alias("j_node"), F.col("component").alias("j_comp")
        )
        new_labels = (
            stepped.join(jump, stepped.component == jump.j_node, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("j_comp", F.col("component")),
                ).alias("component"),
            )
        )
        if (it + 1) % checkpoint_interval == 0:
            # Truncate lineage: three joins per round would otherwise
            # stack into an O(rounds)-deep plan tree.
            new_labels = new_labels.localCheckpoint(eager=False)
        else:
            new_labels = new_labels.persist()
        new_sum = new_labels.agg(sum_expr).collect()[0]["s"]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
        prev_sum = new_sum
    edges.unpersist()
    if not converged:
        if strict:
            raise ConvergenceError(
                f"label propagation did not converge in {max_iterations} "
                "rounds; raise max_iterations"
            )
        return labels.withColumn("converged", F.lit(False))
    return labels
