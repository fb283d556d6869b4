"""Benchmark decontamination — word n-gram overlap against a held-out set.

A training-data pipeline must detect documents that contain verbatim
benchmark/test material before training (the standard n-gram-collision
check popularized by GPT-3/PaLM data cards). This is the Spark-first
shape of that check:

- build each document's DISTINCT word n-gram set declaratively
  (``split`` → ``transform(sequence)`` → ``slice``/``array_join`` —
  whole-stage codegen, no Python),
- the benchmark side collapses to a DISTINCT gram set that is tiny
  relative to the corpus (benchmarks are MBs; the corpus is TBs), so
  the overlap join is a **broadcast** hash join — the 100-TB corpus
  side never shuffles for the join,
- per-doc gram dedup is ``array_distinct`` BEFORE the explode (grams
  repeat only within one document), so the corpus side's only exchange
  is the final map-side-combined count on ``doc_id``.

If the benchmark set ever outgrew the broadcast threshold, AQE falls
back to sort-merge without a code change.

No reference analogue (the reference has no corpus-hygiene surface);
this extends the dedup/quality stack (``operators/dedup.py``,
``functions/text.py``) the same way those extend the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngrams(text: Column, n: int, sep: str = " ") -> Column:
    """Array of word ``n``-grams (joined with ``sep``); empty array for
    documents shorter than ``n`` words. Pure Column expression."""
    words = F.split(text, sep)
    idx = F.sequence(F.lit(1), F.size(words) - F.lit(n - 1))
    return F.when(
        F.size(words) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(words, i, n), sep)),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    docs: DataFrame,
    is_benchmark: Column,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_num: int = 1,
    flag_den: int = 10,
) -> DataFrame:
    """Per-corpus-document benchmark-overlap stats.

    Returns ``(doc_id, n_grams, n_hit, hit_frac, contaminated)`` for
    every non-benchmark document with at least ``n`` words, where
    ``n_hit`` counts the document's distinct ``n``-grams that appear in
    ANY benchmark document and ``contaminated`` flags
    ``n_hit/n_grams >= flag_num/flag_den`` (integer cross-multiply —
    exact, no float threshold).
    """
    # per-doc DISTINCT happens map-side (array_distinct before the
    # explode) — a gram repeats only within one document's array, so no
    # corpus-wide exchange is needed to dedupe it
    grams = docs.withColumn("__bench", is_benchmark).select(
        F.col(id_col),
        F.col("__bench"),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram"),
    )
    bench_grams = (
        grams.filter(F.col("__bench")).select("gram").distinct()
        .withColumn("__hit", F.lit(1))
    )
    corpus = grams.filter(~F.col("__bench"))
    return (
        corpus.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__hit").alias("n_hit"),
        )
        .withColumn(
            "hit_frac",
            F.round(F.col("n_hit").cast("double") / F.col("n_grams"), 9),
        )
        .withColumn(
            "contaminated",
            (F.col("n_hit") * F.lit(flag_den)) >= (F.col("n_grams") * F.lit(flag_num)),
        )
    )
