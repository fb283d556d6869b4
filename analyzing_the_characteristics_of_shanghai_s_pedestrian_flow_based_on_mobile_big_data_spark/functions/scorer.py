"""Hashed-n-gram linear quality scorer (fastText shape) — native expr.

The standard curation stage AFTER the heuristic floors (VERDICT r11
#3): a linear classifier over hashed unigram+bigram features, scored
as the mean of a weight vector's entries at each feature's hash
bucket, plus a bias — exactly the shape a trained fastText /
logistic-regression quality model reduces to at inference time. The
caller supplies the weight vector (a production run loads its trained
model's weights; :func:`demo_weights` provides a deterministic
stand-in for oracle-paired demos).

Scale shape: map-only — one fold over the token array per document,
entirely inside whole-stage codegen; the weight vector is a LITERAL
array in the plan (the _centroid_sims pattern — a broadcast without
an exchange), so scoring 100 TB is a streamed scan with zero
shuffles and zero Python.

Engine parity: the bucket hash is the repo-standard first-8-hex of
md5 (functions/sampling.py:hash_fraction), the score is a 0.0-seeded
sequential left fold over features in document order, and rounding
uses the floor form (multiply+add+floor+divide — kmeans.py's lesson:
library round() can disagree across engines within an ulp of a half
boundary), so the DuckDB twin reproduces the margin bit-for-bit.

No counterpart in the reference — engine breadth for the curation
stack (SURVEY.md §2 extensions).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import tokens


def feature_bucket(feat: Column, n_buckets: int, salt: str = "qs") -> Column:
    """Hash bucket of one feature string: first-8-hex md5 → uint32 →
    mod ``n_buckets``. Salted so independent scorers on the same
    corpus decorrelate (the sampling.py convention)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), feat)), 1, 8), 16, 10
    ).cast("long")
    return h % F.lit(int(n_buckets))


def demo_weights(n_buckets: int = 64, seed: str = "qw") -> list[float]:
    """Deterministic pseudo-random weight vector in [-0.5, 0.5): bucket
    i's weight is md5-derived from (seed, i), rounded to 6 dp so the
    decimal literal round-trips to the identical binary64 in both
    engines. A stand-in for trained model weights — no RNG state, so
    every run and every engine sees the same classifier."""
    return [
        round(
            int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)
            / 2**32
            - 0.5,
            6,
        )
        for i in range(n_buckets)
    ]


def doc_features(toks: Column) -> Column:
    """Feature list of a token array: unigrams followed by space-joined
    bigrams, in document order (the order the score fold consumes).

    PASS A MATERIALIZED COLUMN (``F.col("toks")`` from a prior
    select), not the tokenizer expression: interpreted HOF lambdas
    re-evaluate child expressions PER ELEMENT, so an inline
    ``tokens(text)`` here re-splits the whole text once per token —
    measured 3.4 s → 0.9 s at sf0.1 for the feature stage alone
    (round 12). Bigrams use two O(1) ``element_at`` calls per
    position (identical strings to ``word_shingles(toks, 2)``'s
    slice+concat_ws, which allocates a 2-array per position)."""
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def bucket_weights(
    feats: Column, weights: list[float], salt: str = "qs"
) -> Column:
    """Per-feature weight values (array<double>, feature order): each
    feature md5-bucketed into the literal weight vector. THE expensive
    stage (one md5+conv per feature) — stage it as its own column so
    downstream consumers (the margin fold in both a filter predicate
    and the output projection) duplicate only the cheap sum fold, not
    the hashing: predicate pushdown substitutes aliases into filters,
    so whatever expression computes the margin is evaluated once per
    consuming operator."""
    n_buckets = len(weights)
    wlit = F.expr(
        "array(" + ", ".join(f"{float(w)!r}D" for w in weights) + ")"
    )
    return F.transform(
        feats,
        lambda t: F.element_at(
            wlit, (feature_bucket(t, n_buckets, salt) + 1).cast("int")
        ),
    )


def margin_from_weights(wvals: Column, bias: float = 0.0) -> Column:
    """Margin from a MATERIALIZED per-feature weight-value column: the
    0.0-seeded feature-order sum fold / count + bias, floor-rounded to
    6 dp; empty rows score ``bias``. Identical association order to
    the one-expression form, so the value is bit-identical."""
    wsum = F.aggregate(wvals, F.lit(0.0), lambda acc, w: acc + w)
    n = F.size(wvals)
    raw = F.when(
        n > 0, wsum / n.cast("double") + F.lit(float(bias))
    ).otherwise(F.lit(float(bias)))
    return F.floor(raw * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def margin_from_features(
    feats: Column, weights: list[float], bias: float = 0.0, salt: str = "qs"
) -> Column:
    """Classifier margin from a MATERIALIZED feature-array column (see
    :func:`doc_features` on why staging matters inside HOF plans):
    mean over the features of the literal weight vector's bucket
    entries, plus ``bias``, floor-rounded to 6 dp; feature-less rows
    score ``bias``. One-expression composition of
    :func:`bucket_weights` ∘ :func:`margin_from_weights` — hot paths
    that both FILTER on and EMIT the margin should stage
    ``bucket_weights`` as a column first."""
    return margin_from_weights(bucket_weights(feats, weights, salt), bias)


def linear_quality_margin(
    text: Column,
    weights: list[float],
    bias: float = 0.0,
    salt: str = "qs",
) -> Column:
    """Classifier margin of a document: mean over its hashed features
    of the literal weight vector's bucket entries, plus ``bias``,
    floor-rounded to 6 dp. Feature-less documents score ``bias``.
    ``keep = margin >= threshold`` is the downstream floor; emit the
    margin rather than a sigmoid — exp() is not bit-identical across
    engines' libm, the monotone margin carries the same decision.

    Convenience single-expression form (tokenizes inline — fine for
    small frames and tests); hot paths should stage token and feature
    COLUMNS and use :func:`margin_from_features`, which avoids the
    per-element re-evaluation of inline children inside HOF lambdas
    (see :func:`doc_features`)."""
    return margin_from_features(doc_features(tokens(text)), weights, bias, salt)
