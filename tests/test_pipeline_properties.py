"""Property tests: the new pipeline operators vs exact Python models.

Hypothesis drives randomized corpora through pack_sequences and
decontaminate and compares against straightforward single-threaded
reference implementations — the distributed formulation must agree
exactly on every draw, whatever the partitioning.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.decontam import (
    decontaminate,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.packing import (
    pack_sequences,
)

BUDGET = 64
SHARDS = 4
N = 3


def _ref_pack(docs):
    """doc_id -> (shard, bin) by the prefix-sum rule, per shard."""
    out = {}
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for doc_id, tokens in docs:
        by_shard.setdefault(doc_id % SHARDS, []).append((doc_id, tokens))
    for shard, items in by_shard.items():
        acc = 0
        for doc_id, tokens in sorted(items):
            out[doc_id] = (shard, acc // BUDGET)
            acc += tokens
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.integers(min_value=1, max_value=100),
        min_size=1,
        max_size=60,
    )
)
def test_pack_sequences_matches_reference(spark, token_counts):
    docs = list(enumerate(token_counts))
    df = spark.createDataFrame(docs, "doc_id long, n_tokens long").repartition(7)
    got = {
        r.doc_id: (r.shard, r.bin)
        for r in pack_sequences(df, budget=BUDGET, shards=SHARDS).collect()
    }
    assert got == _ref_pack(docs)


def _ref_decontam(docs, bench_ids):
    grams = {}
    for doc_id, text in docs:
        words = text.split(" ")
        if len(words) >= N:
            grams[doc_id] = {
                " ".join(words[i : i + N]) for i in range(len(words) - N + 1)
            }
    bench = set().union(*(grams[d] for d in bench_ids if d in grams)) if bench_ids else set()
    out = {}
    for doc_id, g in grams.items():
        if doc_id in bench_ids:
            continue
        hits = len(g & bench)
        out[doc_id] = (len(g), hits, hits * 10 >= len(g))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]),  # tiny vocab -> collisions
            min_size=0,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
def test_decontaminate_matches_reference(spark, texts):
    docs = list(enumerate(texts))
    bench_ids = {d for d, _ in docs if d % 3 == 0}
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(5)
    got = {
        r.doc_id: (r.n_grams, r.n_hit, r.contaminated)
        for r in decontaminate(
            df, F.pmod(F.col("doc_id"), F.lit(3)) == 0, n=N
        ).collect()
    }
    assert got == _ref_decontam(docs, bench_ids)
