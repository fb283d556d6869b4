"""Property-based fidelity tests for the batch-29 pair/span operators
(round 9): randomized mini-corpora over a TINY alphabet — the
adversarial regime for every pruning lemma involved (dense document
frequencies, df ties everywhere, sub-window docs, identical docs) —
compared against independent pure-Python brute force. One randomized
corpus exercises all four operators per example, so each Spark
round-trip pays for four checks."""

from __future__ import annotations

import math
from collections import Counter
from itertools import combinations

from hypothesis import given, settings, strategies as st

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
    min_size=2,
    max_size=7,
)


def _shingles(toks, n=3):
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _grams(toks, n):
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@settings(max_examples=6, deadline=None)
@given(corpus_strategy)
def test_pair_operators_match_brute_force_on_dense_corpora(spark, corpus):
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        containment_pairs,
        duplicate_spans,
        simhash,
        simhash_hamming_pairs,
        tf_cosine_pairs,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    # Spark drops createDataFrame rows with empty-string text? No — but
    # split("") yields [""] which the operators treat consistently; the
    # brute force below models the same tokenization (split on space,
    # empties removed for shingle/tf paths, kept for the span path).
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks_of = {i: [t for t in text.split(" ") if t != ""] for i, text in rows}

    # --- containment (n=3, t=4/5) ---------------------------------
    sets = {i: _shingles(t) for i, t in toks_of.items()}
    want_c = sorted(
        (a, b, len(sets[a] & sets[b]) / len(sets[a]))
        for a in sets
        for b in sets
        if a != b and sets[a]
        and 5 * len(sets[a] & sets[b]) >= 4 * len(sets[a])
    )
    got_c = sorted(map(tuple, containment_pairs(docs, n=3).collect()))
    assert got_c == want_c

    # --- simhash hamming (h=3) ------------------------------------
    sig = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    # 64-bit mask before popcount: bin() on a negative xor counts
    # magnitude bits, not two's-complement bits (round-10 fix)
    pop = lambda a, b: bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1")
    want_h = sorted(
        (a, b, pop(a, b))
        for a, b in combinations(sorted(sig), 2)
        if pop(a, b) <= 3
    )
    got_h = sorted(
        map(tuple, simhash_hamming_pairs(docs, max_hamming=3).collect())
    )
    assert got_h == want_h

    # --- tf-cosine (t=4/5, unigram AND 2-gram) --------------------
    for n in (1, 2):
        vecs = {i: Counter(_grams(t, n)) for i, t in toks_of.items()}
        want_t = sorted(
            (a, b, dot / math.sqrt(na2 * nb2))
            for a, b in combinations(sorted(vecs), 2)
            for dot in [sum(vecs[a][k] * vecs[b][k] for k in vecs[a])]
            for na2 in [sum(v * v for v in vecs[a].values())]
            for nb2 in [sum(v * v for v in vecs[b].values())]
            if na2 and nb2 and 25 * dot * dot >= 16 * na2 * nb2
        )
        got_t = sorted(
            map(tuple, tf_cosine_pairs(docs, 4, 5, n=n).collect())
        )
        assert got_t == want_t, f"n={n}"

    # --- duplicate spans (w=3, raw-split positions) ---------------
    w = 3
    raw = {i: text.split(" ") for i, text in rows}
    gram_docs: dict = {}
    for i, t in raw.items():
        for g in {tuple(t[p : p + w]) for p in range(len(t) - w + 1)}:
            gram_docs.setdefault(g, set()).add(i)
    want_s = []
    for i, t in raw.items():
        covered = [
            p + 1
            for p in range(len(t) - w + 1)
            if len(gram_docs[tuple(t[p : p + w])]) >= 2
        ]
        runs: list = []
        for p in covered:
            if runs and p <= runs[-1][1] + w:
                runs[-1][1] = p
            else:
                runs.append([p, p])
        want_s += [(i, s, e + w - 1, e + w - s) for s, e in runs]
    got_s = sorted(
        map(tuple, duplicate_spans(docs, window_words=w).collect())
    )
    assert got_s == sorted(want_s)
