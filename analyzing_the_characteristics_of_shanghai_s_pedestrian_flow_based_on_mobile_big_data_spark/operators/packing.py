"""Sequence packing — assign documents to fixed-token-budget bins.

Training pipelines concatenate documents into fixed-length sequences
("packing") to avoid padding waste. A global greedy pack is inherently
sequential, so the scalable shape is SHARD-LOCAL packing: hash-shard
the corpus, then run the deterministic prefix-sum pack independently
inside each shard. Each shard's window is a separate partition — the
plan is one hash exchange plus a per-partition sort, never a global
`Window.orderBy` (the single-partition scale-killer this repo bans,
see operators/region_build.py).

Bin rule: a document joins bin ``floor(tokens_before_it / budget)``
within its shard, where ``tokens_before_it`` is the running sum over
doc_id order. Deterministic on any engine/partitioning, and exactly
reproducible by a windowed SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs_with_tokens: DataFrame,
    budget: int = 512,
    shards: int = 32,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Per-doc bin assignment: (doc_id, shard, bin, n_tokens).

    ``docs_with_tokens`` must carry a token count column; callers
    compute it with ``functions.text.token_count`` (pure Column).
    """
    shard = F.pmod(F.col(id_col), F.lit(shards))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return (
        docs_with_tokens.withColumn("shard", shard.cast("int"))
        .withColumn("bin", F.floor(before / F.lit(budget)).cast("int"))
        .select(id_col, "shard", "bin", tokens_col)
    )


def pack_stats(packed: DataFrame, tokens_col: str = "n_tokens") -> DataFrame:
    """Roll packed docs up to bins: docs per bin and fill level —
    the padding-waste report a packing pass is judged by."""
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_col).alias("total_tokens"),
    )
