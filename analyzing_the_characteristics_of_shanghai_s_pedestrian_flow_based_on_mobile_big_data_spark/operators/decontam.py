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


def char_ngrams(s: Column, n: int) -> Column:
    """Array of sliding char ``n``-grams of a (pre-lowered) string
    column; empty array below ``n`` characters (guarded — sequence()
    counts DOWN otherwise). Pure Column expression, code-point
    slicing (cross-engine parity probed in functions/scriptq.py)."""
    idx = F.sequence(F.lit(1), F.length(s) - F.lit(n - 1))
    return F.when(
        F.length(s) >= n,
        F.transform(idx, lambda i: F.substring(s, i, n)),
    ).otherwise(F.array().cast("array<string>"))


def script_ngrams(
    text: Column, n_word: int = 8, n_char: int = 12
) -> Column:
    """Decontamination gram universe ROUTED BY SCRIPT: word 8-grams
    are BLIND to scriptio continua (a CJK/Thai benchmark snippet is
    1-2 whitespace "words" — zero 8-grams — so verbatim contamination
    passes the GPT-3-style check untouched). Continua-majority
    documents (the quality/dedup routing predicate,
    functions/scriptq.py:is_continua) emit sliding char
    ``n_char``-grams of the lowered text; everything else the
    standard word ``n_word``-grams. 12 chars ≈ the information
    content of ~6-8 CJK tokens — the same collision-resistance class
    as 8 English words."""
    from ..functions.scriptq import is_continua

    s = F.lower(F.coalesce(text, F.lit("")))
    return F.when(is_continua(s), char_ngrams(s, n_char)).otherwise(
        word_ngrams(text, n_word)
    )


def decontaminate(
    docs: DataFrame,
    is_benchmark: Column,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_num: int = 1,
    flag_den: int = 10,
    ngrams: Column | None = None,
) -> DataFrame:
    """Per-corpus-document benchmark-overlap stats.

    Returns ``(doc_id, n_grams, n_hit, hit_frac, contaminated)`` for
    every non-benchmark document with at least ``n`` words, where
    ``n_hit`` counts the document's distinct ``n``-grams that appear in
    ANY benchmark document and ``contaminated`` flags
    ``n_hit/n_grams >= flag_num/flag_den`` (integer cross-multiply —
    exact, no float threshold). ``ngrams`` substitutes a custom gram
    array expression (the script-routed universe of
    :func:`script_ngrams`) for the default word grams — both sides of
    the overlap, benchmark and corpus, use the same universe.
    """
    gram_arr = (
        ngrams if ngrams is not None else word_ngrams(F.col(text_col), n)
    )
    # per-doc DISTINCT happens map-side (array_distinct before the
    # explode) — a gram repeats only within one document's array, so no
    # corpus-wide exchange is needed to dedupe it
    grams = docs.withColumn("__bench", is_benchmark).select(
        F.col(id_col),
        F.col("__bench"),
        F.explode(F.array_distinct(gram_arr)).alias("gram"),
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
