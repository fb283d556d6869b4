"""Streaming corpus curation — the batch hygiene stack on a live feed.

Documents arrive continuously (crawl output landing as files); each
micro-batch must pass the SAME filters the batch pipeline applies:
quality floor, token floor, and benchmark decontamination. A document's verdict depends only on the document itself and the
STATIC benchmark gram set — no cross-batch context — so the right
streaming shape is ``foreachBatch``: each micro-batch runs the exact
batch plan (broadcast stream-static join + batch-local aggregation),
touching no state store and needing no watermark. A naive
``writeStream`` over the same groupBy would force a stateful
aggregation keyed by doc_id — unbounded state for zero benefit.

Reuses the batch operators verbatim (functions/text.py quality/tokens,
operators/decontam.py word_ngrams) — one definition of "clean" for
both latency regimes; batch/stream parity is the test contract
(tests/test_streaming_curation.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score, token_count
from ..operators.decontam import word_ngrams


def benchmark_gram_set(bench_docs: DataFrame, n: int = 8, text_col: str = "text") -> DataFrame:
    """Static side: DISTINCT word n-grams of the benchmark corpus.
    Tiny (benchmarks are MBs) — broadcast into every micro-batch."""
    return (
        bench_docs.select(
            F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )


def curate_stream(
    doc_stream: DataFrame,
    bench_grams: DataFrame,
    n: int = 8,
    min_quality: float = 0.5,
    min_tokens: int = 5,
    max_hit_frac_num: int = 1,
    max_hit_frac_den: int = 10,
) -> DataFrame:
    """Filter a document stream to clean rows: quality and token floors
    evaluate map-side; contamination is the distinct-gram hit fraction
    against the broadcast benchmark set, flagged by integer
    cross-multiply (no float threshold). Output: doc_id, n_tokens,
    quality, n_grams, n_hit — only rows that pass every gate.

    A pure batch transformation: apply it to each micro-batch via
    :func:`run_curation_stream` (foreachBatch) or to a static corpus
    directly — one definition of clean for both regimes. Per-call cost
    is one broadcast hash join plus a batch-local aggregation.

    Documents shorter than the shingle width (fewer than ``n`` words,
    so zero n-grams) that pass the quality/token gates are KEPT as
    uncontaminated with ``n_grams = n_hit = 0`` — ``explode_outer``
    carries them through the join as a single null-gram row that can
    never match a benchmark gram. (The previous inner ``explode``
    silently dropped 5–7-word docs that had cleared every gate.)"""
    scored = doc_stream.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
        F.array_distinct(word_ngrams(F.col("text"), n)).alias("grams"),
    ).filter(
        (F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    )
    grams = scored.select(
        "doc_id", "n_tokens", "quality", F.explode_outer("grams").alias("gram")
    )
    per_doc = (
        grams.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy("doc_id", "n_tokens", "quality")
        .agg(
            F.count("gram").alias("n_grams"),
            F.count("__hit").alias("n_hit"),
        )
    )
    return per_doc.filter(
        (F.col("n_grams") == 0)
        | (
            (F.col("n_hit") * F.lit(max_hit_frac_den))
            < (F.col("n_grams") * F.lit(max_hit_frac_num))
        )
    )


def curate_redact_stream(
    doc_stream: DataFrame,
    bench_grams: DataFrame,
    patterns: dict[str, str] | None = None,
    n: int = 8,
    **gates,
) -> DataFrame:
    """The curation gate PLUS the redaction stage in one micro-batch
    plan (round 11): survivors of :func:`curate_stream` joined back to
    their PII-masked text — (doc_id, n_tokens, quality, n_grams,
    n_hit, n_redacted, redacted_text), the row a training-data sink
    actually writes. Redaction is a stateless per-row map
    (operators/dedup.py:redacted_text — placeholder masking, zero
    shuffles), so composing it here adds no state store, no
    watermark, and no cross-batch context: the same foreachBatch
    shape, one definition of clean-and-masked for both latency
    regimes (batch/stream parity pytested). Like curate_stream, apply
    to a static corpus directly or drive with
    :func:`run_curation_stream`-style foreachBatch."""
    from ..operators.dedup import redacted_text

    verdicts = curate_stream(doc_stream, bench_grams, n=n, **gates)
    red = redacted_text(doc_stream, patterns).select(
        "doc_id", "n_redacted", "redacted_text"
    )
    return verdicts.join(red, "doc_id")


def run_curation_stream(
    doc_stream: DataFrame,
    bench_grams: DataFrame,
    sink,
    checkpoint: str,
    n: int = 8,
    **gates,
):
    """Drive the curation gate over a document stream with foreachBatch:
    ``sink(batch_df, epoch_id)`` receives each micro-batch's clean rows.
    Returns the StreamingQuery (caller awaits/stops)."""

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        sink(curate_stream(batch_df, bench_grams, n=n, **gates), epoch_id)

    return (
        doc_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def full_gate_stream(
    doc_stream: DataFrame,
    charlm_table: list[float],
    min_quality: float = 0.5,
    min_tokens: int = 5,
    max_top_word_frac: float = 0.12,
    max_dup_2gram_frac: float = 0.05,
    max_dup_3gram_frac: float = 0.02,
    min_mean_p: float = 0.62,
    lang: str = "en",
) -> DataFrame:
    """The round-13 full per-doc gate set (the batch `curation_full`
    query minus its cross-batch dedup window) as a stateless
    micro-batch transformation: language-ID, quality floor, token
    floor, Gopher repetition pass, and the charlm mean-probability
    floor against a PRE-TRAINED table (production trains on a
    reference corpus once — the CCNet shape — never on the stream
    itself, which would make verdicts batch-order-dependent). Every
    gate is a map-side expression, so each micro-batch is one streamed
    scan: no state store, no watermark, no join. Cross-batch dedup
    stays the band/digest index path (incremental.py). Batch/stream
    parity is the test contract."""
    from ..functions.charlm import charlm_score_expr
    from ..functions.langid import predict_lang_tokens_cached
    from ..functions.text import repetition_stats

    scored = doc_stream.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
        predict_lang_tokens_cached().alias("pred_lang"),
        repetition_stats(F.col("text")).alias("rep"),
        charlm_score_expr(F.col("text"), charlm_table).alias("lm"),
    )
    return scored.filter(
        (F.col("pred_lang") == lang)
        & (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("rep.top_word_frac") <= max_top_word_frac)
        & (F.col("rep.dup_2gram_frac") <= max_dup_2gram_frac)
        & (F.col("rep.dup_3gram_frac") <= max_dup_3gram_frac)
        & (F.col("lm.mean_p") >= min_mean_p)
    ).select(
        "doc_id",
        "n_tokens",
        "quality",
        F.col("rep.top_word_frac").alias("top_word_frac"),
        F.col("lm.mean_p").alias("mean_p"),
    )


def dsir_select_stream(
    doc_stream: DataFrame,
    ratios: list[float],
    min_score: float,
    max_score: float,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR selection on a document stream (round 14): the batch
    decision (functions/dsir.py:dsir_select) applied per micro-batch
    under a PRE-BUILT ratio table and TRAINING-TIME min/max — all
    three frozen, the full_gate_stream charlm-table shape, so a doc's
    verdict is a pure function of the doc and any split of the corpus
    into micro-batches is invisible (parity pytested). No state
    store, no watermark, no join: the importance score is a literal-
    weight margin fold, the coin a stable md5 — selection-on-ingest
    rides the scan exactly like the quality gates."""
    from ..functions.dsir import dsir_select

    return dsir_select(
        doc_stream, ratios, min_score, max_score, salt=salt
    )


def multiscript_gate_stream(
    doc_stream: DataFrame,
    targets: tuple = ("ar", "en", "hi", "ja", "ko", "ru", "th", "zh"),
    min_quality: float = 0.5,
    min_tokens: int = 5,
    max_char3_dup: float = 0.20,
    max_top_word_frac: float = 0.15,
    max_dup_2gram_frac: float = 0.10,
    max_dup_3gram_frac: float = 0.05,
) -> DataFrame:
    """The MULTILINGUAL gate set (batch `curation_multiscript` minus
    its cross-batch dedup window) as a stateless micro-batch
    transformation: 32-language script-routed classification against
    a target mix, script-aware token and quality floors, and
    repetition routed by script — char-trigram duplicate fraction for
    continua-majority docs, multilingual Gopher word shingles
    otherwise. Every gate is a map-side expression over the streamed
    scan: no state store, no watermark, no join; a doc's verdict is a
    pure function of its text, so any split into micro-batches is
    invisible (batch/stream parity is the test contract, the
    full_gate_stream/dsir_select_stream shape). Cross-batch exact
    dedup stays the digest index path (incremental.py)."""
    from ..functions.langid import predict_lang_script
    from ..functions.scriptq import (
        char_ngram_dup_frac,
        is_continua,
        quality_score_script,
        script_token_count,
    )
    from ..functions.text import repetition_stats

    s = F.lower(F.coalesce(F.col("text"), F.lit("")))
    scored = doc_stream.select(
        "doc_id",
        "text",
        s.alias("s"),
        predict_lang_script(F.col("text")).alias("pred"),
        script_token_count(F.col("text")).alias("n_tokens"),
        quality_score_script(F.col("text")).alias("quality"),
        is_continua(s).cast("int").alias("cont"),
    ).filter(
        F.col("pred").isin(*targets)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("quality") >= min_quality)
    )
    rep = repetition_stats(F.col("text"))
    return scored.withColumn(
        "rep_ok",
        F.when(
            F.col("cont") == 1,
            char_ngram_dup_frac(F.col("s"), 3) <= max_char3_dup,
        ).otherwise(
            (rep.getField("top_word_frac") <= max_top_word_frac)
            & (rep.getField("dup_2gram_frac") <= max_dup_2gram_frac)
            & (rep.getField("dup_3gram_frac") <= max_dup_3gram_frac)
        ),
    ).filter(F.col("rep_ok")).select(
        "doc_id", "pred", "n_tokens", "quality", "cont"
    )
