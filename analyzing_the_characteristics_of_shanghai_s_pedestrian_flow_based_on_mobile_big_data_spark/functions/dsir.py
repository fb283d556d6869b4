"""DSIR-shaped data selection — importance scoring + resampling.

The public method (Xie et al. 2023, *Data Selection for Language
Models via Importance Resampling*): estimate feature distributions of
a small TARGET corpus and the big RAW corpus over hashed n-grams, and
resample raw documents with probability proportional to their
importance weight, so the selected data looks like the target. The
standard pipeline stage between heuristic floors and training.

Engine adaptation, deliberately transcendental-free (the charlm rule —
this repo's oracle gate is bit-exact value hashing and neither log nor
exp carries a cross-engine ulp contract):

- Feature distributions are add-one-smoothed HASHED-BUCKET
  probabilities: p[b] = (count_b + 1) / (total + n_buckets) — integer
  ratios, one double division per cell, exactly reproducible in SQL.
  The count table is bucket-bounded (the charlm 28³ argument): at any
  corpus size the aggregate collects like a codebook.
- The per-document weight is the MEAN per-feature probability RATIO
  (Σ p_t[b(f)]/p_r[b(f)] over the doc's features, in document order,
  / n_features) — NOT DSIR's product-of-ratios/log-sum, whose exp/log
  round-trip is not engine-portable. The mean ranks the same
  direction (target-like features lift it above 1) and reduces to the
  scorer's margin fold, so scoring is the existing map-only
  literal-weight machinery (bucket_weights ∘ margin_from_weights).
- Resampling is the stable md5 coin against rate = score/max(score)
  (importance resampling normalized by the corpus max — a 1-row
  broadcast aggregate, never a driver fold), 6dp floor-rounded on
  both engines before the compare (the mixture_sampled_counts rule).

Scale shape: two bounded count aggregates (train), then one streamed
scan scoring + one broadcast 1-row max + the coin — no corpus-sized
shuffle anywhere before the final group-by-class report.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .scorer import (
    bucket_weights,
    doc_features,
    feature_bucket,
    margin_from_weights,
)
from .text import tokens


def hashed_bucket_counts(
    docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = 256,
    salt: str = "qs",
) -> tuple[list[int], int]:
    """(per-bucket unigram+bigram feature counts, total count) — one
    bounded hash aggregate, driver-collected like a codebook. The
    bucket hash/salt is the scorer's, so DSIR tables and classifier
    weights describe the same feature space."""
    toks_df = docs.select(tokens(F.col(text_col)).alias("toks"))
    f = toks_df.select(doc_features(F.col("toks")).alias("f"))
    ex = (
        f.select(
            F.explode(
                F.transform(
                    F.col("f"),
                    lambda t: feature_bucket(t, n_buckets, salt).cast(
                        "int"
                    ),
                )
            ).alias("b")
        )
        .groupBy("b")
        .agg(F.count("*").alias("c"))
    )
    counts = [0] * n_buckets
    for r in ex.collect():
        counts[int(r.b)] = int(r.c)
    return counts, sum(counts)


def dsir_ratio_table(
    target_counts: list[int],
    target_total: int,
    raw_counts: list[int],
    raw_total: int,
) -> list[float]:
    """Per-bucket importance ratios p_target/p_raw under add-one
    smoothing — every cell two integer-ratio double divisions and one
    double division, reproduced bit-for-bit by the SQL twin over the
    same integer counts."""
    nb = len(target_counts)
    return [
        ((target_counts[b] + 1) / (target_total + nb))
        / ((raw_counts[b] + 1) / (raw_total + nb))
        for b in range(nb)
    ]


def dsir_score(feats: Column, ratios: list[float], salt: str = "qs") -> Column:
    """Mean per-feature importance ratio of a document (6dp floor
    rounding; feature-less docs score 0.0) — the scorer margin fold
    with the ratio table as the literal weight vector. Stage ``feats``
    as a materialized column (the doc_features HOF rules)."""
    return margin_from_weights(
        bucket_weights(feats, ratios, salt), n=F.size(feats)
    )


def dsir_select(
    docs: DataFrame,
    ratios: list[float],
    min_score: float,
    max_score: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """Selection decisions under a PRE-BUILT DSIR table and FROZEN
    normalizers: (id, n_feats, score, rate, keep) for every doc, keep
    iff the stable md5 coin < flr₆((score − min)/(max − min)) clamped
    to [0, 1]. min/max are the TRAINING-time corpus scales — frozen
    like the charlm table, which is what makes this a stateless
    per-doc map usable unchanged on a stream (a batch-local max would
    make verdicts depend on micro-batch boundaries). Degenerate
    max == min keeps everything."""
    from .sampling import hash_fraction

    toks_df = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("toks")
    )
    feats = toks_df.select(
        id_col, doc_features(F.col("toks")).alias("feats")
    )
    score = dsir_score(F.col("feats"), ratios)
    lo, hi = float(min_score), float(max_score)
    if hi == lo:
        rate = F.lit(1.0)
    else:
        raw = (
            F.floor(
                (F.col("score") - F.lit(lo))
                / F.lit(hi - lo)
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        )
        rate = F.least(F.lit(1.0), F.greatest(F.lit(0.0), raw))
    scored = feats.select(
        F.col(id_col),
        F.size("feats").cast("int").alias("n_feats"),
        score.alias("score"),
    ).withColumn("rate", rate)
    return scored.withColumn(
        "keep", hash_fraction(F.col(id_col), salt=salt) < F.col("rate")
    )
