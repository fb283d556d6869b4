from __future__ import annotations

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)

DOC_A = "the quick brown fox jumps over the lazy dog and runs far away today"
DOC_A2 = "the quick brown fox jumps over the lazy dog and runs far away tonight"
DOC_B = "completely different text about spark query engines and big data systems"


def _docs(spark):
    return spark.createDataFrame(
        [(1, DOC_A), (2, DOC_A2), (3, DOC_B), (4, DOC_A)],
        "doc_id long, text string",
    )


def test_exact_dedup_groups_identical_texts(spark):
    out = {r.canonical_id: r.n_docs for r in exact_dedup(_docs(spark)).collect()}
    assert out[1] == 2  # docs 1 and 4 identical, canonical = min id
    assert out[2] == 1 and out[3] == 1


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(_docs(spark), n=3, threshold=0.5).collect()
    }
    assert pairs[(1, 4)] == 1.0  # exact dup
    assert 0.5 <= pairs[(1, 2)] < 1.0  # one word changed
    assert (1, 3) not in pairs


def test_ngram_jaccard_prefix_filter_exact(spark):
    """Prefix-filtered candidate generation is exact: identical pair set
    and jaccard values as the unfiltered inverted-index formulation, at
    multiple thresholds, on a corpus with a deliberately hot shared
    shingle ("the quick brown ..." prefix in most docs)."""
    docs = spark.createDataFrame(
        [
            (1, DOC_A),
            (2, DOC_A2),
            (3, DOC_B),
            (4, DOC_A),
            (5, "the quick brown fox jumps over the lazy dog and runs far away"),
            (6, "the quick brown fox sleeps under the lazy dog and runs far away today"),
            (7, "spark query engines and big data systems are completely different"),
        ],
        "doc_id long, text string",
    )
    for t in (0.3, 0.5, 0.8):
        fast = {
            (r.doc_a, r.doc_b): round(r.jaccard, 9)
            for r in ngram_jaccard_pairs(
                docs, n=3, threshold=t, prefix_filter=True
            ).collect()
        }
        slow = {
            (r.doc_a, r.doc_b): round(r.jaccard, 9)
            for r in ngram_jaccard_pairs(
                docs, n=3, threshold=t, prefix_filter=False
            ).collect()
        }
        assert fast == slow, f"threshold {t}: {fast} != {slow}"


def test_ngram_jaccard_prefix_filter_exact_on_testdata(spark):
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    fast = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    slow = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in ngram_jaccard_pairs(
            docs, n=3, threshold=0.5, prefix_filter=False
        ).collect()
    }
    assert fast == slow


def test_minhash_lsh_candidates_superset_of_dups(spark):
    cands = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_pairs(_docs(spark), k=8, bands=4).collect()
    }
    assert (1, 4) in cands  # identical docs always collide on every band
    assert (1, 3) not in cands and (2, 3) not in cands


def test_simhash_near_dup_closer_than_unrelated(spark):
    sigs = {r.doc_id: r.simhash for r in simhash(_docs(spark)).collect()}
    assert sigs[1] == sigs[4]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sigs[1], sigs[2]) < ham(sigs[1], sigs[3])


def test_connected_components_transitive(spark):
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.components import (
        connected_components,
    )

    # chain 1-2-3, separate pair 10-11, chain 20-21-22-23 (path graph)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_connected_components_deep_chain_converges(spark):
    """64-node path graph (diameter 63): pointer jumping converges in
    O(log d) rounds within the default budget, with per-round
    checkpointing keeping lineage bounded — the plan must not stack 63
    joins."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.components import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 64)], "doc_a long, doc_b long"
    )
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got == {i: 1 for i in range(1, 65)}


def test_connected_components_nonconvergence_flagged(spark):
    import pytest

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.components import (
        ConvergenceError,
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 64)], "doc_a long, doc_b long"
    )
    with pytest.raises(ConvergenceError):
        connected_components(pairs, max_iterations=1)
    flagged = connected_components(pairs, max_iterations=1, strict=False)
    assert "converged" in flagged.columns
    assert flagged.filter("converged = false").count() == 64


def test_choose_jaccard_path_skew_vs_uniform(spark):
    """VERDICT r2 #2 (adaptive path): the candidate-generation strategy
    must follow corpus shape — single join on a uniform corpus (no hot
    shingle: prefix filter's 2 extra stages are pure overhead), prefix
    filter on a skewed one (a shingle shared by m >> sqrt(N) docs makes
    the single join's reducer ~m^2) — and the adaptive default must
    produce the identical pair set either way."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        choose_jaccard_path,
        ngram_jaccard_pairs,
    )

    uniform = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(10))) for i in range(50)],
        "doc_id long, text string",
    )
    assert choose_jaccard_path(uniform) is False

    hot = "the quick brown fox jumps over"
    skewed = spark.createDataFrame(
        [(i, f"{hot} tail{i}a tail{i}b tail{i}c tail{i}d") for i in range(50)],
        "doc_id long, text string",
    )
    assert choose_jaccard_path(skewed) is True

    # beyond LARGE_CORPUS_DOCS the probe is skipped: prefix, always
    assert choose_jaccard_path(uniform, n_docs=10_000_000) is True

    for corpus in (uniform, skewed):
        auto = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in ngram_jaccard_pairs(corpus, n=3, threshold=0.5).collect()
        }
        for flag in (True, False):
            explicit = {
                (r.doc_a, r.doc_b, round(r.jaccard, 9))
                for r in ngram_jaccard_pairs(
                    corpus, n=3, threshold=0.5, prefix_filter=flag
                ).collect()
            }
            assert auto == explicit


def test_near_dup_pairs_auto_sparse_equals_exact(spark):
    """The auto-routed document near-dup join must equal
    ngram_jaccard_pairs pair-for-pair (and value-for-value) on a
    sparse corpus, and report the exact route."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        near_dup_pairs_auto,
        ngram_jaccard_pairs,
    )

    docs = _docs(spark)
    auto = near_dup_pairs_auto(docs, n=3, threshold_num=1, threshold_den=2)
    assert auto.__setsim_path__ == "exact"
    got = sorted(map(tuple, auto.collect()))
    want = sorted(
        map(tuple, ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect())
    )
    assert got == want and len(got) > 0


def test_near_dup_components_equals_uncollapsed(spark):
    """Exact-digest pre-collapse must be a pure physical optimization:
    membership AND labels identical to
    connected_components(minhash_lsh_pairs(docs)) — on a fixture with
    a planted exact-dup group, a cross-text near-dup bridging it, and
    unrelated docs, and again on the real sf0.001 corpus."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.components import (
        connected_components,
        near_dup_components,
    )
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
        load_table,
    )

    fixture = spark.createDataFrame(
        [
            (1, DOC_A),
            (2, DOC_A2),   # near-dup of A (one word changed)
            (3, DOC_B),
            (4, DOC_A),    # exact dup of 1
            (9, DOC_A),    # exact dup of 1
            (10, DOC_B),   # exact dup of 3
            (11, "totally unrelated singleton content nothing shared here"),
        ],
        "doc_id long, text string",
    )
    for docs in (fixture, load_table(spark, "/root/testdata/sf0.001", "documents")):
        want = sorted(
            (r.node, r.component)
            for r in connected_components(
                minhash_lsh_pairs(docs, k=8, bands=4, n=3)
            ).collect()
        )
        got = sorted(
            (r.doc_id, r.component)
            for r in near_dup_components(docs, k=8, bands=4, n=3).collect()
        )
        assert got == want
    # fixture sanity: the exact-dup group {1,4,9} fused with near-dup 2
    comp = {
        r.doc_id: r.component
        for r in near_dup_components(fixture).collect()
    }
    assert comp[1] == comp[2] == comp[4] == comp[9] == 1
    assert comp[3] == comp[10] == 3
    assert 11 not in comp


def test_near_dup_components_zero_shingle_duplicates_not_clustered(spark):
    """Round-7 review fix: duplicated texts with FEWER than n tokens
    produce no shingles, hence no signature rows, hence no LSH pairs —
    the uncollapsed baseline omits them, and the collapse's
    within-group fallback must too (it is gated on the same ≥ n-token
    test doc_shingles applies). Empty and NULL texts likewise."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.components import (
        connected_components,
        near_dup_components,
    )

    docs = spark.createDataFrame(
        [
            (1, "hi there"),        # 2 tokens < n=3: zero shingles
            (2, "hi there"),        # exact dup of 1 — must NOT cluster
            (3, ""),
            (4, ""),
            (5, None),
            (6, None),
            (7, DOC_A),
            (8, DOC_A),             # real dup group — must cluster
        ],
        "doc_id long, text string",
    )
    want = sorted(
        (r.node, r.component)
        for r in connected_components(minhash_lsh_pairs(docs)).collect()
    )
    got = sorted(
        (r.doc_id, r.component) for r in near_dup_components(docs).collect()
    )
    assert got == want == [(7, 7), (8, 7)]


def test_doc_shingles_presence_matches_token_count(spark):
    """near_dup_components gates its zero-shingle fallback on
    token_count(text) >= n, assuming doc_shingles' inline tokenizer is
    equivalent to functions.text.tokens(). Pin that equivalence on
    adversarial texts: mixed/duplicated whitespace, tabs/newlines,
    leading/trailing space, empty, NULL, exactly n-1 and n tokens."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.functions.text import (
        token_count,
    )
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        doc_shingles,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "a b"),
        (2, "a b c"),
        (3, "  a\t\tb \n c  "),
        (4, "a     b"),
        (5, ""),
        (6, "   "),
        (7, None),
        (8, "one two three four"),
        (9, "\tx\n"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n = 3
    has_shingle = {
        r.doc_id
        for r in doc_shingles(docs, n).select("doc_id").distinct().collect()
    }
    gate = {
        r.doc_id
        for r in docs.filter(token_count(F.col("text")) >= n).collect()
    }
    assert has_shingle == gate == {2, 3, 8}


def test_near_dup_pairs_auto_no_cache_growth(spark):
    """Round-8 lifecycle contract (VERDICT r7 #7): parameter-varied
    near_dup_pairs_auto invocations in one session must not accumulate
    CacheManager entries — the shingle table (and the LSH route's
    signature table) are materialized via eager localCheckpoint, whose
    blocks the ContextCleaner reclaims once the caller drops the
    result, instead of .persist(), which pins one entry per distinct
    (n, threshold) plan forever."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        near_dup_pairs_auto,
    )

    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    was_empty = cache_mgr.isEmpty()
    docs = _docs(spark)
    for n, num, den, kwargs in [
        (3, 1, 2, {}),
        (2, 1, 2, {}),
        (3, 8, 10, {}),
        # force the LSH route too (set_similarity_join_lsh's signature
        # table shares the same lifecycle rule)
        (3, 1, 2, {"pairs_per_key_budget": 0, "min_lsh_keys": 1}),
        (3, 1, 2, {"pairs_per_key_budget": 0, "min_lsh_keys": 1,
                   "target_recall": 0.9}),
    ]:
        out = near_dup_pairs_auto(
            docs, n=n, threshold_num=num, threshold_den=den, **kwargs
        )
        out.collect()
        del out
    assert cache_mgr.isEmpty() == was_empty
    if was_empty:
        assert cache_mgr.isEmpty()


def test_near_dup_pairs_auto_propagates_meta(spark):
    """__setsim_meta__ travels through the document-level wrapper so a
    pipeline reading the routing decision sees the same contract the
    set-level router surfaced."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        near_dup_pairs_auto,
    )

    docs = _docs(spark)
    auto = near_dup_pairs_auto(docs, n=3, threshold_num=1, threshold_den=2)
    assert auto.__setsim_meta__["path"] == auto.__setsim_path__ == "exact"
    lsh = near_dup_pairs_auto(
        docs, n=3, threshold_num=1, threshold_den=2,
        pairs_per_key_budget=0, min_lsh_keys=1, target_recall=0.8,
    )
    meta = lsh.__setsim_meta__
    assert lsh.__setsim_path__ == "lsh"
    assert meta["target_recall"] == 0.8
    assert meta["expected_recall_at_threshold"] >= 0.8
    assert meta["k"] % meta["bands"] == 0


def test_lsh_hot_bucket_cap_pairs_identical(spark):
    """Round-8 hot-band quotient (VERDICT r7 #2): the capped path must
    produce the IDENTICAL candidate pair set. Fixture plants the exact
    failure mode — boilerplate groups of byte-DISTINCT docs (case
    variants: doc_shingles lowercases, so shingle sets and therefore
    whole signatures agree while md5(text) differs, defeating the
    exact-text pre-collapse) — plus ordinary near-dup and unrelated
    docs so cold buckets, hot-vs-cold overlap, and cross-class hot
    collisions are all exercised."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        minhash_bands,
        lsh_pairs_from_bands,
    )

    rows = []
    base = "the quick brown fox jumps over the lazy dog near the river"
    # two boilerplate groups of 6 case-variant copies each
    for g, text in enumerate([base, base + " tonight again and again"]):
        for i in range(6):
            words = text.split()
            words[i % len(words)] = words[i % len(words)].upper()
            rows.append((g * 100 + i, " ".join(words)))
    # a genuine near-dup pair and unrelated docs
    rows.append((500, base + " extra trailing words here"))
    rows.append((600, "completely different content about spark plans"))
    rows.append((601, "another unrelated document with its own words"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bands_df = minhash_bands(docs, k=8, bands=4, n=3)
    want = sorted(
        map(tuple, lsh_pairs_from_bands(bands_df).collect())
    )
    assert len(want) >= 2 * 15  # both 6-groups fully paired: C(6,2)=15
    for cap in (1, 2, 4, 100):
        got = sorted(
            map(
                tuple,
                lsh_pairs_from_bands(bands_df, hot_bucket_cap=cap).collect(),
            )
        )
        assert got == want, f"cap={cap}"


def test_near_dup_components_cap_invariant(spark):
    """near_dup_components labels must not depend on the hot-bucket
    cap or the signature-class star expansion (both are physical-plan
    choices only). Two boilerplate group sizes bracket the adaptive
    savings gate: the 12-variant group (Σ C(g,2)=66 > 2·docs) ENGAGES
    the star quotient, the lone pair stays on the skip path — the
    labels must be identical to the uncollapsed clique composition in
    both regimes."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.components import (
        near_dup_components,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for i in range(12):
        words = base.split()
        words[i % len(words)] = words[i % len(words)].upper() + (
            "" if i < len(words) else "X"
        )
        rows.append((i, " ".join(words)))
    rows.append((10_000, "unrelated text with completely different words here"))
    docs12 = spark.createDataFrame(rows, "doc_id long, text string")
    small = [(i, r[1]) for i, r in enumerate(rows[:5])] + [
        (10_000, "unrelated text with completely different words here")
    ]
    docs5 = spark.createDataFrame(small, "doc_id long, text string")
    for docs in (docs12, docs5):
        want = sorted(
            map(
                tuple,
                near_dup_components(
                    docs, hot_bucket_cap=None, collapse_signatures=False
                ).collect(),
            )
        )
        for kwargs in (
            {"hot_bucket_cap": 2},
            {"hot_bucket_cap": None},
            {"hot_bucket_cap": 2, "collapse_signatures": False},
        ):
            got = sorted(
                map(tuple, near_dup_components(docs, **kwargs).collect())
            )
            assert got == want, kwargs
        assert len(want) >= 5


def test_star_gate_memo_and_override(spark, monkeypatch):
    """Round-9 (VERDICT r8 #1): the star-quotient engagement decision
    is a pure function of (corpus, banding), so it is memoized per
    plan hash — a REPEAT invocation over the same corpus must run
    ZERO probe work (pinned structurally: signature_digest poisoned,
    so a memoized plain decision that still touched the class table
    would raise). star_gate= overrides the gate outright with labels
    unchanged (both routes are physical-plan choices only)."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators import (
        components as comp,
    )
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators import (
        dedup as dd,
    )

    comp.clear_star_gate_cache()
    # clean corpus (no byte-distinct signature duplicates): gate=skip
    clean = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_A2), (3, DOC_B), (4, DOC_A)],
        "doc_id long, text string",
    )
    want = sorted(map(tuple, comp.near_dup_components(clean).collect()))
    assert len(comp._STAR_GATE_CACHE) == 1
    assert list(comp._STAR_GATE_CACHE.values()) == [False]

    def _boom(*a, **k):
        raise AssertionError("probe ran on a memoized invocation")

    monkeypatch.setattr(dd, "signature_digest", _boom)
    again = sorted(map(tuple, comp.near_dup_components(clean).collect()))
    assert again == want
    # explicit override: plain path forced, probe untouched, labels equal
    forced = sorted(
        map(
            tuple,
            comp.near_dup_components(clean, star_gate=False).collect(),
        )
    )
    assert forced == want
    monkeypatch.undo()

    # boilerplate corpus: gate=star memoized True; repeat + star_gate=True
    # agree with the uncollapsed composition
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for i in range(12):
        words = base.split()
        words[i % len(words)] = words[i % len(words)].upper()
        rows.append((i, " ".join(words)))
    rows.append((10_000, "unrelated text with completely different words"))
    boiler = spark.createDataFrame(rows, "doc_id long, text string")
    comp.clear_star_gate_cache()
    want_b = sorted(
        map(
            tuple,
            comp.near_dup_components(
                boiler, collapse_signatures=False
            ).collect(),
        )
    )
    got_b = sorted(map(tuple, comp.near_dup_components(boiler).collect()))
    assert got_b == want_b
    assert list(comp._STAR_GATE_CACHE.values()) == [True]
    got_memo = sorted(map(tuple, comp.near_dup_components(boiler).collect()))
    got_forced = sorted(
        map(
            tuple,
            comp.near_dup_components(boiler, star_gate=True).collect(),
        )
    )
    assert got_memo == want_b and got_forced == want_b
    comp.clear_star_gate_cache()


def test_star_gate_stats_preseed_skips_probe(spark, monkeypatch):
    """Round-10 (VERDICT r9 #6): the memo kills the repeat-invocation
    probe; ``star_stats`` must kill the FIRST one — a cold-cache
    invocation with supplied stats runs ZERO probe work (pinned
    structurally: signature_digest poisoned; a plain decision that
    still touched the class table would raise), labels unchanged, and
    the decision is seeded into the memo. Precedence: an existing
    memo entry wins over contradictory stats."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators import (
        components as comp,
    )
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators import (
        dedup as dd,
    )

    clean = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_A2), (3, DOC_B), (4, DOC_A)],
        "doc_id long, text string",
    )
    comp.clear_star_gate_cache()
    want = sorted(map(tuple, comp.near_dup_components(clean).collect()))
    comp.clear_star_gate_cache()

    def _boom(*a, **k):
        raise AssertionError("probe ran despite supplied star_stats")

    monkeypatch.setattr(dd, "signature_digest", _boom)
    # clean-corpus stats: no signature-duplicate classes -> plain path
    stats = {"n_rows": 4, "n_keys": 4, "cand_pairs": 0.0, "max_df": 1}
    got = sorted(
        map(
            tuple,
            comp.near_dup_components(clean, star_stats=stats).collect(),
        )
    )
    assert got == want
    # the stats-seeded decision entered the memo
    assert list(comp._STAR_GATE_CACHE.values()) == [False]
    # memo precedence: contradictory stats are ignored on a warm memo
    # (still plain -> poisoned digest still untouched)
    boiler_stats = {"n_rows": 4, "n_keys": 4, "cand_pairs": 99.0, "max_df": 4}
    again = sorted(
        map(
            tuple,
            comp.near_dup_components(
                clean, star_stats=boiler_stats
            ).collect(),
        )
    )
    assert again == want
    assert list(comp._STAR_GATE_CACHE.values()) == [False]
    monkeypatch.undo()
    comp.clear_star_gate_cache()
    # star-voting stats on a boilerplate corpus: labels still equal
    # the uncollapsed composition (route change is physical only)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for i in range(12):
        words = base.split()
        words[i % len(words)] = words[i % len(words)].upper()
        rows.append((i, " ".join(words)))
    boiler = spark.createDataFrame(rows, "doc_id long, text string")
    want_b = sorted(
        map(
            tuple,
            comp.near_dup_components(
                boiler, collapse_signatures=False
            ).collect(),
        )
    )
    got_b = sorted(
        map(
            tuple,
            comp.near_dup_components(
                boiler,
                star_stats={
                    "n_rows": 12,
                    "n_keys": 12,
                    "cand_pairs": 66.0,
                    "max_df": 12,
                },
            ).collect(),
        )
    )
    assert got_b == want_b
    assert list(comp._STAR_GATE_CACHE.values()) == [True]
    comp.clear_star_gate_cache()


def test_simhash_hamming_pairs_complete_cover(spark):
    """Round-9: the Manku block join must equal the brute-force
    all-pairs hamming filter EXACTLY (the pigeonhole cover is
    complete — no probabilistic recall), at several budgets."""
    from itertools import combinations

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        simhash,
        simhash_hamming_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(0, base)]
    for i in range(1, 10):
        words = base.split()
        words[i % len(words)] = words[i % len(words)] + "x"
        rows.append((i, " ".join(words)))
    rows.append((100, "totally different words about spark engines here"))
    rows.append((101, "another unrelated short document sample text"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # mask to 64 bits before popcount: signatures are two's-complement
    # BIGINTs (bit 63 = -2^63), and Python's bin() on a NEGATIVE xor
    # counts magnitude bits, not two's-complement bits — without the
    # mask this brute force is wrong whenever exactly one signature
    # of a pair has bit 63 set (round-10 fix; h=8 exercises the
    # 3-block combination cover)
    sig = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    pop = lambda a, b: bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1")
    for h in (0, 1, 3, 6, 8):
        want = sorted(
            (a, b, pop(a, b))
            for a, b in combinations(sorted(sig), 2)
            if pop(a, b) <= h
        )
        got = sorted(
            map(
                tuple,
                simhash_hamming_pairs(docs, max_hamming=h).collect(),
            )
        )
        assert got == want, f"max_hamming={h}"
    assert len(want) >= 3  # the h=6 run found real structure


def test_containment_pairs_exact_and_asymmetric(spark):
    """Round-9: the prefix-filtered containment join must equal the
    brute-force definition |A∩B|/|A| >= t over shingle sets in BOTH
    orientations — including the case symmetric Jaccard misses by
    construction: a short doc wholly quoted inside a long one
    (C(A in B)=1 while J << t)."""
    from itertools import permutations

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        containment_pairs,
        doc_shingles,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog tonight"
    long_doc = (
        "unrelated prefix words keep arriving here and then "
        + quote
        + " followed by much more trailing content about engines "
        + "systems pipelines clusters shuffles and partitions galore"
    )
    rows = [
        (1, quote),                 # contained in 2
        (2, long_doc),
        (3, quote + " almost"),     # near-contained variant
        (4, "completely different text with its own vocabulary set"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sets = {}
    for r in doc_shingles(docs, 3).collect():
        sets.setdefault(r.doc_id, set()).add(r.shingle)
    num, den = 4, 5
    want = sorted(
        (a, b, len(sets[a] & sets[b]) / len(sets[a]))
        for a, b in permutations(sorted(sets), 2)
        if den * len(sets[a] & sets[b]) >= num * len(sets[a])
    )
    got = sorted(
        map(
            tuple,
            containment_pairs(
                docs, n=3, threshold_num=num, threshold_den=den
            ).collect(),
        )
    )
    assert got == want
    # the planted quote: fully contained, ordered (1, 2), and invisible
    # to the symmetric join at the same threshold
    assert any(a == 1 and b == 2 and c == 1.0 for a, b, c in got)
    jac = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()
    }
    assert (1, 2) not in jac


def test_duplicate_spans_matches_brute_force(spark):
    """Round-9: the windowed ExactSubstr span extraction must equal a
    pure-Python reference (overlapping w-gram df >= 2 distinct docs ->
    covered positions -> merged maximal islands) — planted passages at
    DIFFERENT alignments, plus an exact-copy doc and a clean doc."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        duplicate_spans,
    )

    quote = "one two three four five six seven eight nine ten eleven twelve"
    d1 = quote + " tailA tailB tailC tailD tailE tailF tailG tailH"
    d2 = "lead1 lead2 lead3 lead4 lead5 " + quote + " endA endB endC"
    d3 = "nothing shared here at all with anyone ever truly unique words"
    rows = [(1, d1), (2, d2), (3, d3), (4, d1)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    w = 5

    grams = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        grams[doc_id] = [
            tuple(toks[p : p + w]) for p in range(len(toks) - w + 1)
        ]
    df_docs = {}
    for doc_id, gs in grams.items():
        for g in set(gs):
            df_docs.setdefault(g, set()).add(doc_id)
    want = []
    for doc_id, gs in grams.items():
        covered = [
            p + 1 for p, g in enumerate(gs) if len(df_docs[g]) >= 2
        ]
        runs = []
        for p in covered:
            if runs and p <= runs[-1][1] + w:
                runs[-1][1] = p
            else:
                runs.append([p, p])
        for s, e in runs:
            want.append((doc_id, s, e + w - 1, e + w - s))
    got = sorted(
        map(
            tuple,
            duplicate_spans(docs, window_words=w, min_docs=2).collect(),
        )
    )
    assert got == sorted(want)
    # the planted quote is found at both alignments; the clean doc is
    # absent; the exact copy is covered end to end
    by_doc = {}
    for doc_id, s, e, n in got:
        by_doc.setdefault(doc_id, []).append((s, e))
    assert (1, 12) in [t for t in by_doc[1]] or by_doc[1][0][0] == 1
    assert by_doc[2][0] == (6, 17)
    assert 3 not in by_doc
    n_toks_d1 = len(d1.split(" "))
    assert by_doc[4] == [(1, n_toks_d1)] and by_doc[1] == [(1, n_toks_d1)]


def test_span_cleaned_stats_rebuild(spark):
    """Round-9: the span cut must rebuild exactly the tokens outside
    every duplicated extent, in order — checked against a pure-Python
    rebuild on the planted-alignment corpus, including the
    removed-whole (exact duplicate) and untouched-doc rows."""
    import hashlib

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        duplicate_spans,
        span_cleaned_stats,
    )

    quote = "one two three four five six seven eight nine ten eleven twelve"
    d1 = quote + " tailA tailB tailC tailD tailE tailF tailG tailH"
    d2 = "lead1 lead2 lead3 lead4 lead5 " + quote + " endA endB endC"
    d3 = "nothing shared here at all with anyone ever truly unique words"
    rows = [(1, d1), (2, d2), (3, d3), (4, d1)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    w = 5

    spans = {}
    for r in duplicate_spans(docs, window_words=w).collect():
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    want = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        cut = set()
        for s, e in spans.get(doc_id, []):
            cut.update(range(s, e + 1))
        kept = [t for i, t in enumerate(toks, 1) if i not in cut]
        want[doc_id] = (
            len(toks),
            len(cut),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_md5)
        for r in span_cleaned_stats(docs, window_words=w).collect()
    }
    assert got == want
    # structure: docs 1 and 4 are exact copies -> removed whole
    # (md5 of ""), doc 3 untouched, doc 2 loses exactly the quote span
    empty = hashlib.md5(b"").hexdigest()
    assert got[1][2] == empty and got[4][2] == empty
    assert got[3][1] == 0
    assert 0 < got[2][1] < got[2][0]


def test_simhash_banding_invariants():
    """Round-10 (VERDICT r9 #1): the Manku blocking selector must (a)
    cover the budget by pigeonhole — for EVERY way to corrupt
    max_hamming blocks, some emitted combination survives intact; (b)
    keep every combination's key ≥ 16 bits (the old 8-bit blocks at
    h=3/32-bit made the candidate join effectively quadratic); (c)
    partition all 64 bits across blocks; (d) refuse budgets no
    blocking can satisfy rather than quietly degrading."""
    from itertools import combinations

    import pytest

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        simhash_banding,
    )

    for h in range(0, 9):
        widths, combos = simhash_banding(h, 64)
        B = len(widths)
        m = len(combos[0])
        assert sum(widths) == 64
        assert all(len(c) == m for c in combos)
        assert len(combos) == len(set(combos))
        # (b) every key >= 16 bits
        assert all(sum(widths[i] for i in c) >= 16 for c in combos)
        # (a) pigeonhole cover: corrupt ANY h blocks — some combo
        # avoids all of them
        for bad in combinations(range(B), min(h, B)):
            assert any(not set(c) & set(bad) for c in combos), (h, bad)
        # expected band counts: single-block through h=3, 2-block
        # 4..6, 3-block 7..8 (the documented ladder)
        assert m == (1 if h <= 3 else 2 if h <= 6 else 3)
    # h=9 is the refusal edge: no m under max_bands clears the floor
    with pytest.raises(ValueError, match="min_key_bits"):
        simhash_banding(9, 64)
    with pytest.raises(ValueError, match="min_key_bits"):
        # h=48 leaves <16 usable bits per combination at any m
        simhash_banding(48, 64)
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_banding(-1, 64)


def test_tf_cosine_pairs_matches_brute_force(spark):
    """Round-9: the Bayardo prefix-pruned APSS join must equal the
    all-pairs tf-cosine definition exactly — including the case
    set-Jaccard flattens by construction: token REPETITION (two docs
    over the same small vocabulary with near-identical frequency
    profiles have cosine ~1 while their 3-gram Jaccard stays low)."""
    import math
    from collections import Counter
    from itertools import combinations

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        tf_cosine_pairs,
    )

    rows = [
        (1, "spark spark spark shuffle shuffle join"),
        (2, "spark spark spark spark shuffle shuffle shuffle join"),
        (3, "join shuffle spark spark spark shuffle"),  # reordered 1
        (4, "wholly different vocabulary here truly unrelated text"),
        (5, "spark join"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    num, den = 9, 10
    vecs = {d: Counter(t.split()) for d, t in rows}
    want = []
    for a, b in combinations(sorted(vecs), 2):
        dot = sum(vecs[a][t] * vecs[b][t] for t in vecs[a])
        na2 = sum(v * v for v in vecs[a].values())
        nb2 = sum(v * v for v in vecs[b].values())
        if den * den * dot * dot >= num * num * na2 * nb2:
            want.append((a, b, dot / math.sqrt(na2 * nb2)))
    got = sorted(
        map(tuple, tf_cosine_pairs(docs, num, den).collect())
    )
    assert got == sorted(want)
    # the reorder/repetition pair is found; the unrelated doc is not
    found = {(a, b) for a, b, _ in got}
    assert (1, 3) in found and (1, 2) in found
    assert all(4 not in p for p in found)


def test_tf_cosine_dense_guard_routes_or_raises(spark):
    """Round-10 (VERDICT r9 #2): on a vocabulary-degenerate corpus
    the maxweight prefix bound cannot bite, so tf_cosine_pairs_auto
    must either RAISE with the measured stats (default) or ESCALATE
    n until the rare-term tail reappears — never silently run the
    Ω(U²) plan. On a rare-term corpus it must route straight to the
    exact join at the requested n."""
    import pytest

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        tf_cosine_dense_stats,
        tf_cosine_pairs,
        tf_cosine_pairs_auto,
    )

    # 60 docs over a 30-word vocabulary: unigram df ~ 24 so every doc
    # meets nearly every other (dense), while 3-grams (27000 possible
    # values over ~600 instances) are near-unique (sparse)
    import random

    rng = random.Random(7)
    vocab = [f"w{k}" for k in range(30)]
    dense_rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(12)))
        for i in range(60)
    ]
    dense = spark.createDataFrame(dense_rows, "doc_id long, text string")
    s1 = tf_cosine_dense_stats(dense, n=1, min_keys=10, pairs_per_key_budget=4)
    assert s1["path"] == "lsh" and s1["n_keys"] == 60
    with pytest.raises(ValueError, match="dense regime"):
        tf_cosine_pairs_auto(
            dense, 9, 10, n=1, min_keys=10, pairs_per_key_budget=4
        )
    # escalation: 3-grams of the 12-token random sequences are near
    # unique, the probe passes and the result EQUALS the exact join
    # at the escalated n
    esc = tf_cosine_pairs_auto(
        dense, 9, 10, n=1, min_keys=10, pairs_per_key_budget=4,
        on_dense="escalate",
    )
    s3 = tf_cosine_dense_stats(dense, n=3, min_keys=10, pairs_per_key_budget=4)
    assert s3["path"] == "exact"
    want = sorted(map(tuple, tf_cosine_pairs(dense, 9, 10, n=3).collect()))
    assert sorted(map(tuple, esc.collect())) == want
    # rare-term corpus routes to exact at the requested n
    sparse_rows = [(i, f"tok{i}a tok{i}b tok{i}c") for i in range(60)]
    sparse = spark.createDataFrame(sparse_rows, "doc_id long, text string")
    out = tf_cosine_pairs_auto(
        sparse, 9, 10, n=1, min_keys=10, pairs_per_key_budget=4
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, tf_cosine_pairs(sparse, 9, 10, n=1).collect())
    )
    # pre-seeded stats (the catalog path) skip the probe job for the
    # first n and still gate: dense stats -> raise without touching
    # the corpus
    with pytest.raises(ValueError, match="dense regime"):
        tf_cosine_pairs_auto(
            dense, 9, 10, n=1, min_keys=10, pairs_per_key_budget=4,
            stats=dict(s1),
        )


def test_tf_cosine_pairs_decimal_membership_beyond_int64(spark):
    """Round-10 (ADVICE r9): the cross-multiplied threshold must stay
    EXACT past the int64 wrap point. Two token-repetitive docs with
    na2 = 4·10^8 each put num²·na2_a·na2_b ≈ 1.3·10^19 > 2^63 — the
    old long arithmetic wrapped silently there; DECIMAL(38,0) must
    keep the (cosine = 1.0) pair in and judge the near-miss pair by
    value, not by wraparound."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        tf_cosine_pairs,
    )

    big = "x " * 20000  # na2 = 20000² = 4e8
    rows = [
        (1, big.strip()),
        (2, big.strip()),
        (3, ("x " * 19000 + "y " * 9221).strip()),  # cos(1,3) ≈ 0.8997 < 0.9
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.cosine
        for r in tf_cosine_pairs(docs, 9, 10).collect()
    }
    assert (1, 2) in got and abs(got[(1, 2)] - 1.0) < 1e-12
    assert (1, 3) not in got and (2, 3) not in got
    # review finding: the REPORTED cosine must also survive past the
    # point where na2_a*na2_b itself exceeds 2^63 (70k-token docs:
    # na2 = 4.9e9 each, product 2.4e19) — the old int64 product
    # wrapped negative and sqrt returned NaN
    huge = ("x " * 70000).strip()
    docs2 = spark.createDataFrame(
        [(1, huge), (2, huge)], "doc_id long, text string"
    )
    out2 = tf_cosine_pairs(docs2, 9, 10).collect()
    assert len(out2) == 1
    c = out2[0].cosine
    assert c == c and abs(c - 1.0) < 1e-12  # not NaN, exactly 1


def test_tf_cosine_pairs_envelope_guard_raises(spark):
    """Round-10 (ADVICE r9): when na2_a·na2_b reaches the
    DECIMAL(38,0) envelope 10^38/den², the operator must RAISE, not
    silently null the row out of the filter. A huge den shrinks the
    envelope so ordinary docs trip the guard."""
    import pytest

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        tf_cosine_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a a a a b"), (2, "a a a a b")], "doc_id long, text string"
    )
    # den = 10^17 -> envelope na2_a*na2_b < 10^4; na2 = 17 each -> 289 ok
    # but na2 = 101 each -> 10201 >= 10^4 trips it
    big = spark.createDataFrame(
        [(1, "a " * 10 + "b"), (2, "a " * 10 + "b")],
        "doc_id long, text string",
    )
    num, den = 9 * 10**16, 10**17
    assert tf_cosine_pairs(docs, num, den).count() == 1  # inside envelope
    with pytest.raises(Exception, match="exactness envelope"):
        tf_cosine_pairs(big, num, den).collect()


def test_subsumption_fixpoint_reinstates_chain_middle_victim(spark):
    """Round-10 (VERDICT r9 #5): planted chain A ⊂ B ⊂ C at t=0.8
    with containment(A in C) < 0.8 — greedy drops A on B's now-moot
    evidence; the fixpoint kernel reinstates A because its only
    dominating container B falls to C. On a chain-free corpus (exact
    dups + unrelated docs) the two rules must AGREE exactly."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        subsumption_prune,
        subsumption_prune_fixpoint,
    )

    a = [f"a{i}" for i in range(8)]
    b = [f"b{i}" for i in range(56)]
    c = [f"c{i}" for i in range(16)]
    # A: 6 shingles, all inside B -> C(A in B) = 1
    # B: 62 shingles, 54 pure-b ones inside C -> C(B in C) = 54/62 ≈ .87
    # C: drops the a-prefix entirely -> C(A in C) = 0
    rows = [
        (1, " ".join(a)),
        (2, " ".join(a + b)),
        (3, " ".join(b + c)),
        (4, "totally unrelated text with nothing shared here at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    greedy = {
        r.doc_id: r.kept for r in subsumption_prune(docs, n=3, threshold_num=4, threshold_den=5).collect()
    }
    fix = {
        r.doc_id: r.kept
        for r in subsumption_prune_fixpoint(
            docs, n=3, threshold_num=4, threshold_den=5
        ).collect()
    }
    assert greedy == {1: False, 2: False, 3: True, 4: True}
    assert fix == {1: True, 2: False, 3: True, 4: True}
    # n_containers is evidence-seen on both variants
    nc = {
        r.doc_id: r.n_containers
        for r in subsumption_prune_fixpoint(
            docs, n=3, threshold_num=4, threshold_den=5
        ).collect()
    }
    assert nc == {1: 1, 2: 1, 3: 0, 4: 0}
    # chain-free corpus: exact duplicate pair + unrelated -> identical
    flat_rows = [
        (1, "one two three four five six seven eight nine ten"),
        (2, "one two three four five six seven eight nine ten"),
        (3, "eleven twelve thirteen fourteen fifteen sixteen seventeen"),
    ]
    flat = spark.createDataFrame(flat_rows, "doc_id long, text string")
    g2 = sorted(map(tuple, subsumption_prune(flat).collect()))
    f2 = sorted(map(tuple, subsumption_prune_fixpoint(flat).collect()))
    assert g2 == f2


def test_subsumption_prune_survivors(spark):
    """Round-9: the subsumption action must (a) keep exactly one
    survivor per mutually-contained class (exact duplicates), (b) drop
    a doc wholly quoted inside a longer one, (c) keep unrelated docs,
    and (d) equal a brute-force dominance computation over the exact
    containment pairs."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        containment_pairs,
        doc_shingles,
        subsumption_prune,
    )

    quote = "the quick brown fox jumps over the lazy dog tonight"
    long_doc = (
        "unrelated prefix words keep arriving here and then "
        + quote
        + " followed by much more trailing content about engines"
    )
    rows = [
        (1, quote),        # contained in 2 -> dropped
        (2, long_doc),     # container -> kept
        (3, "completely different text with its own vocabulary set"),
        (4, quote),        # exact dup of 1: mutual containment class
        (5, "tiny doc"),   # sub-window: sz 0, trivially kept
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.sz, r.n_containers, r.kept)
        for r in subsumption_prune(docs, n=3).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    # brute force from the exact pair view
    sizes = {
        d: 0 for d, _ in rows
    }
    for r in doc_shingles(docs, 3).collect():
        sizes[r.doc_id] = sizes.get(r.doc_id, 0) + 1
    pairs = [
        (r.doc_a, r.doc_b)
        for r in containment_pairs(docs, n=3).collect()
    ]
    for d, _ in rows:
        n_cont = sum(1 for a, b in pairs if a == d)
        dom = any(
            sizes[b] > sizes[a]
            or (sizes[b] == sizes[a] and b < a)
            for a, b in pairs
            if a == d
        )
        assert got[d] == (sizes[d], n_cont, not dom), d
    # semantic spot checks
    assert not got[1][2] and got[2][2] and got[3][2] and got[5][2]
    # exact-dup class {1, 4}: exactly one survivor, the smaller id
    assert not got[4][2] and not got[1][2] or (got[1][2] != got[4][2])
    assert sum(1 for d in (1, 4) if got[d][2]) in (0, 1)


def test_block_table_scheme_enforcement(spark):
    """Round 11 (VERDICT r10 #1): hamming_pairs_from_blocks must REFUSE
    a block table whose blocking disagrees with the query parameters —
    a table built at h=3 (4 combination ids) queried at h=6 (28
    expected) silently loses the pigeonhole cover without the guard."""
    import pytest

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        _banding_from_scheme,
        hamming_block_scheme,
        hamming_pairs_from_blocks,
        simhash_banding,
        simhash_blocks,
        simhash_hamming_pairs,
    )

    docs = _docs(spark)
    blocks_h3 = simhash_blocks(docs, max_hamming=3).localCheckpoint()
    # matching parameters: verification passes and the pairs equal the
    # end-to-end join
    ok = sorted(
        map(tuple, hamming_pairs_from_blocks(blocks_h3, max_hamming=3).collect())
    )
    want = sorted(
        map(tuple, simhash_hamming_pairs(docs, max_hamming=3).collect())
    )
    assert ok == want
    # cross-budget query: refused, not silently incomplete
    with pytest.raises(ValueError, match="combination ids"):
        hamming_pairs_from_blocks(blocks_h3, max_hamming=6)
    with pytest.raises(ValueError, match="combination ids"):
        hamming_pairs_from_blocks(blocks_h3, max_hamming=1)
    # same budget, different key floor → different banding at h=4
    blocks_h4_lo = simhash_blocks(docs, max_hamming=4, min_key_bits=8)
    with pytest.raises(ValueError, match="combination ids"):
        hamming_pairs_from_blocks(blocks_h4_lo, max_hamming=4)  # default 16
    # the scan-less stamp check: scheme dict is the authority
    stamp_h3 = hamming_block_scheme(3)
    with pytest.raises(ValueError, match="scheme mismatch"):
        hamming_pairs_from_blocks(blocks_h3, max_hamming=6, scheme=stamp_h3)
    assert (
        sorted(
            map(
                tuple,
                hamming_pairs_from_blocks(
                    blocks_h3, max_hamming=3, scheme=stamp_h3
                ).collect(),
            )
        )
        == want
    )
    # stamp → banding reconstruction round-trips the selector exactly
    for h in (0, 1, 3, 4, 6, 8):
        assert _banding_from_scheme(hamming_block_scheme(h)) == tuple(
            simhash_banding(h)
        ) or _banding_from_scheme(hamming_block_scheme(h)) == simhash_banding(h)


def test_new_doc_hamming_candidates_min_key_bits_threaded(spark):
    """Round-11 ADVICE fix: scoring a delta against an index built
    with a non-default min_key_bits must use the INDEX's banding —
    threaded explicitly — and the scheme= stamp refuses a drift
    before any job runs."""
    import pytest

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        hamming_block_scheme,
        new_doc_hamming_candidates,
        simhash_blocks,
        simhash_hamming_pairs,
    )

    docs = _docs(spark)
    old = docs.filter("doc_id <= 2")
    new = docs.filter("doc_id >= 3")
    # index built under a NON-default key floor (h=4, min_key_bits=8:
    # m=1/5 combos vs the default m=2/15 — genuinely different keys)
    idx = simhash_blocks(old, max_hamming=4, min_key_bits=8).localCheckpoint()
    got = sorted(
        (r.new_doc_id, r.doc_id, r.hamming)
        for r in new_doc_hamming_candidates(
            idx, new, max_hamming=4, min_key_bits=8
        ).collect()
    )
    full = {
        tuple(sorted((r.doc_a, r.doc_b))): r.hamming
        for r in simhash_hamming_pairs(docs, max_hamming=4).collect()
    }
    want = sorted(
        (n, o, h)
        for (a, b), h in full.items()
        for (n, o) in [(a, b) if a >= 3 else (b, a)]
        if (a >= 3) != (b >= 3)
    )
    assert got == want
    # the old silent failure: default min_key_bits against the 8-bit
    # index — with the stamp wired through, the STAMP drives the
    # delta's banding (min_key_bits never restated), so the scored
    # pairs come out right without knowing the build-time selector
    got_scheme = sorted(
        (r.new_doc_id, r.doc_id, r.hamming)
        for r in new_doc_hamming_candidates(
            idx, new, max_hamming=4, scheme=hamming_block_scheme(4, 64, 8)
        ).collect()
    )
    assert got_scheme == want
    # and without a stamp, the default index verification catches the
    # banding drift the defaults would otherwise silently cause
    with pytest.raises(ValueError, match="combination ids"):
        new_doc_hamming_candidates(idx, new, max_hamming=4)  # default 16


def test_subsumption_fixpoint_deep_chain_exercises_loop(spark):
    """Round 11: the restructured kernel resolves chain-free corpora
    AND pure A⊂B⊂C chains in closed form (zero loop rounds) — this
    4-level chain forces a victim→victim core edge so the per-round
    recursion actually runs, and the verdict must equal a Python
    brute-force kernel over the exact shingle sets."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        subsumption_prune_fixpoint,
    )

    seg = {
        k: [f"s{k}w{i}" for i in range(n)]
        for k, n in enumerate([6, 14, 22, 30, 38], start=1)
    }
    rows = [(k, " ".join(seg[k] + seg[k + 1])) for k in range(1, 5)]
    rows.append((9, "totally unrelated filler text with nothing shared"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # Python reference: shingle sets -> containment >= 1/2 ->
    # dominance DAG -> kernel by well-founded recursion
    def sh(text):
        w = text.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    S = {d: sh(t) for d, t in rows}
    edges = {
        (a, b)
        for a in S
        for b in S
        if a != b
        and len(S[a] & S[b]) * 2 >= len(S[a])
        and (len(S[b]) > len(S[a]) or (len(S[b]) == len(S[a]) and b < a))
    }
    kept_ref, undecided = {}, set(S)
    while undecided:
        moved = False
        for d in sorted(undecided):
            cs = [b for (a, b) in edges if a == d]
            if any(kept_ref.get(b) for b in cs if b not in undecided):
                kept_ref[d], moved = False, True
                undecided.discard(d)
            elif all(b not in undecided and not kept_ref[b] for b in cs):
                kept_ref[d], moved = True, True
                undecided.discard(d)
        assert moved, "reference kernel stalled"
    # the chain must actually be 4 levels of domination (core edge)
    assert {(a, b) for (a, b) in edges} == {(1, 2), (2, 3), (3, 4)}
    got = {
        r.doc_id: r.kept
        for r in subsumption_prune_fixpoint(
            docs, n=3, threshold_num=1, threshold_den=2
        ).collect()
    }
    assert got == kept_ref
    # alternation along the chain: D kept, C dropped, B kept, A dropped
    assert got == {1: False, 2: True, 3: False, 4: True, 9: True}


def test_simhash_weighted_vote_matches_brute_force(spark):
    """Round 11 (VERDICT r10 #6): both vote modes — distinct-token
    (default) and Manku tf-weighted — must equal a pure-Python
    reference over the same md5 nibble-lane bit scheme; on a
    repetition-dominated doc the two signatures must differ in the
    direction the dominant token pulls."""
    import hashlib

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        simhash,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha alpha alpha alpha alpha alpha alpha alpha beta gamma"),
        (3, "Mixed CASE   tokens  mixed case tokens again"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def tok_bit(tok: str, j: int) -> int:
        h = hashlib.md5(tok.encode()).hexdigest()
        if j < 32:
            return 1 if h[j] in "89abcdef" else 0
        return 1 if h[j - 32] in "4567cdef" else 0

    def ref_sig(text: str, weighted: bool) -> int:
        toks = [t for t in text.lower().strip().split() if t]
        if not weighted:
            toks = sorted(set(toks))
        sig = 0
        for j in range(64):
            v = sum(1 if tok_bit(t, j) else -1 for t in toks)
            if v > 0:
                sig |= 1 << j
        return sig - (1 << 64) if sig >= 1 << 63 else sig

    for weighted in (False, True):
        got = {
            r.doc_id: r.simhash
            for r in simhash(docs, weighted=weighted).collect()
        }
        want = {d: ref_sig(t, weighted) for d, t in rows}
        assert got == want, f"weighted={weighted}"
    # doc 2: tf-weighting must move the signature toward token
    # 'alpha' — every bit where alpha disagrees with the set vote
    # CAN flip; at minimum the two modes disagree somewhere
    assert ref_sig(rows[1][1], True) != ref_sig(rows[1][1], False)


def test_redaction_composes_with_span_cut_in_one_pass(spark):
    """Round 11 (VERDICT r10 #4): the fused redact_and_clean_text must
    equal redacted_text applied AFTER span_cleaned_text (per-token
    masking commutes with positional removal), and the pattern
    precedence must be deterministic: email > phone > id, dashed
    shapes are phones, bare long digit runs are ids."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        pattern_spans,
        redact_and_clean_text,
        redacted_text,
        span_cleaned_text,
    )

    rows = [
        (
            1,
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "contact user1@example.com or +86-21-5550001 ref 900000001",
        ),
        (
            2,
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "with mail two2@test.org trailing words here",
        ),
        (3, "short doc 12345678 not an id and 555 not a phone"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # pattern classification, including the disjoint shapes
    kinds = {
        (r.doc_id, r.span_start): r.kind for r in pattern_spans(docs).collect()
    }
    assert kinds == {
        (1, 12): "email",
        (1, 14): "phone",
        (1, 16): "id",
        (2, 13): "email",
    }
    fused = {
        r.doc_id: (r.n_removed, r.n_redacted, r.cleaned_text)
        for r in redact_and_clean_text(docs, window_words=5, min_docs=2).collect()
    }
    staged_txt = {
        r.doc_id: r.redacted_text
        for r in redacted_text(
            span_cleaned_text(docs, window_words=5, min_docs=2),
            text_col="cleaned_text",
        ).collect()
    }
    assert {d: t for d, (_, _, t) in fused.items()} == staged_txt
    # the shared 10-token prefix is a duplicated span (window 5): both
    # docs lose it; doc 1's PII tokens survive the cut and are masked
    assert fused[1][0] >= 10 and fused[1][1] == 3
    assert "<EMAIL>" in fused[1][2] and "<PHONE>" in fused[1][2]
    assert "<ID>" in fused[1][2]
    assert fused[3] == (0, 0, rows[2][1])


def test_apply_span_cut_generic_span_sources(spark):
    """Round 11: the generic cut accepts ANY (doc_id, span_start,
    span_end) table — pattern spans (cut PII instead of masking),
    hand blocklists, unions, overlapping extents — and must equal a
    positional reference; wired to duplicate_spans it must reproduce
    span_cleaned_text exactly."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        apply_span_cut,
        duplicate_spans,
        pattern_spans,
        span_cleaned_text,
    )

    rows = [
        (1, "keep1 keep2 bob@x.org keep3 900000001 keep4"),
        (2, "one two three four five six seven eight nine ten"),
        (3, "one two three four five six seven eight nine ten"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # PII spans cut out entirely (positions 3 and 5 of doc 1)
    cut = {
        r.doc_id: (r.n_removed, r.cleaned_text)
        for r in apply_span_cut(docs, pattern_spans(docs)).collect()
    }
    assert cut[1] == (2, "keep1 keep2 keep3 keep4")
    assert cut[2] == (0, rows[1][1]) and cut[3] == (0, rows[2][1])
    # overlapping + out-of-order spans dedupe via covered positions
    spans = spark.createDataFrame(
        [(2, 2, 5), (2, 4, 7), (2, 4, 5)],
        "doc_id long, span_start int, span_end int",
    )
    got2 = apply_span_cut(docs, spans).filter("doc_id = 2").collect()[0]
    assert (got2.n_removed, got2.cleaned_text) == (6, "one eight nine ten")
    # generic cut ∘ duplicate_spans ≡ the hard-wired span_cleaned_text
    a = sorted(
        map(
            tuple,
            apply_span_cut(
                docs, duplicate_spans(docs, window_words=5, min_docs=2)
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            span_cleaned_text(docs, window_words=5, min_docs=2).collect(),
        )
    )
    assert a == b


def test_weighted_vote_threads_through_hamming_stack(spark):
    """Round 11: weighted= reaches every layer of the blocking stack —
    the pair join runs on tf-vote signatures and equals the brute
    force over them, and the vote mode is part of the scheme stamp so
    a set-vote query against a weighted index REFUSES instead of
    silently matching nothing."""
    import pytest

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        hamming_block_scheme,
        hamming_pairs_from_blocks,
        new_doc_hamming_candidates,
        simhash,
        simhash_blocks,
        simhash_hamming_pairs,
    )

    # repetition separates the modes: doc 2's flood of 'alpha' moves
    # only the weighted signature
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha alpha alpha alpha alpha alpha beta gamma delta epsilon zeta eta theta"),
        (3, "totally different words about engines and planners"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for weighted in (False, True):
        sig = {
            r.doc_id: r.simhash
            for r in simhash(docs, weighted=weighted).collect()
        }
        pop = lambda a, b: bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1")
        for h in (1, 4, 8):
            want = sorted(
                (a, b, pop(a, b))
                for a in sig
                for b in sig
                if a < b and pop(a, b) <= h
            )
            got = sorted(
                map(
                    tuple,
                    simhash_hamming_pairs(
                        docs, max_hamming=h, weighted=weighted
                    ).collect(),
                )
            )
            assert got == want, (weighted, h)
    # the two modes genuinely diverge on this corpus
    s_set = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    s_tf = {r.doc_id: r.simhash for r in simhash(docs, weighted=True).collect()}
    assert s_set[2] != s_tf[2]
    # vote mode is scheme: weighted stamp vs set-vote query refuses,
    # and the weighted stamp round-trips
    blocks_w = simhash_blocks(docs, max_hamming=3, weighted=True)
    stamp_w = hamming_block_scheme(3, weighted=True)
    assert stamp_w["vote"] == "tf" and "vote" not in hamming_block_scheme(3)
    with pytest.raises(ValueError, match="scheme mismatch"):
        hamming_pairs_from_blocks(blocks_w, max_hamming=3, scheme=stamp_w)
    ok = hamming_pairs_from_blocks(
        blocks_w, max_hamming=3, scheme=stamp_w, weighted=True
    )
    assert ok.columns == ["doc_a", "doc_b", "hamming"]
    with pytest.raises(ValueError, match="scheme mismatch"):
        new_doc_hamming_candidates(
            blocks_w, docs.filter("doc_id = 3"), max_hamming=3, scheme=stamp_w
        )


def test_redaction_refuses_nonportable_regex(spark):
    """Round 11: lookaround/backreference patterns would silently
    diverge between Spark's Java regex and DuckDB's RE2 — the
    redaction family refuses them up front instead of shipping an
    oracle row that lies."""
    import pytest

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        pattern_spans,
        redacted_text,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    for bad in (
        {"x": r"^(?=a).*$"},          # lookahead
        {"x": r"^(?<!b)a$"},          # lookbehind
        {"x": r"^(a)\1$"},            # backreference
        {"x": r"^[0-9]*+$"},          # possessive quantifier
        {"x": r"^(?>ab)c$"},          # atomic group
        {"x": r"^a{1,2}+$"},          # possessive bounded quantifier
    ):
        with pytest.raises(ValueError, match="portable regex subset"):
            pattern_spans(docs, bad)
        with pytest.raises(ValueError, match="portable regex subset"):
            redacted_text(docs, bad).collect()
    # empty patterns refuse with the clear error, not a py4j crash
    with pytest.raises(ValueError, match="non-empty"):
        pattern_spans(docs, {})
    with pytest.raises(ValueError, match="non-empty"):
        redacted_text(docs, {})
    # the shipped defaults, escaped-plus quantifiers, and plain custom
    # patterns pass (escaped + followed by a quantifier is portable)
    assert pattern_spans(docs, {"x": r"^[ab]{1,2}$"}).count() == 2
    assert pattern_spans(docs, {"x": r"^a\+*$"}).count() == 1


def test_band_index_scheme_gates_batch_scoring(spark, tmp_path):
    """Round 11: the MinHash twin of the block-side guard — scoring a
    batch against a band index stamped under different (k, bands, n)
    refuses scan-lessly instead of silently matching nothing."""
    import pytest

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        minhash_band_scheme,
        minhash_bands,
        new_doc_dup_candidates,
    )
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.streaming.incremental import (
        _pin_index_scheme,
        read_index_scheme,
    )

    docs = _docs(spark)
    idx = minhash_bands(docs.filter("doc_id <= 2"), k=8, bands=4, n=3)
    new = docs.filter("doc_id >= 3")
    path = str(tmp_path / "band_idx")
    _pin_index_scheme(path, minhash_band_scheme(8, 4, 3))
    stamp = read_index_scheme(path)
    # matching parameters pass and find the near-dup pair (3? no —
    # doc 4 duplicates doc 1)
    got = {
        (r.new_doc_id, r.doc_id)
        for r in new_doc_dup_candidates(
            idx, new, k=8, bands=4, n=3, scheme=stamp
        ).collect()
    }
    assert (4, 1) in got
    # any drifted parameter refuses before a job runs
    for kk, bb, nn in ((16, 4, 3), (8, 2, 3), (8, 4, 2)):
        with pytest.raises(ValueError, match="band-index scheme mismatch"):
            new_doc_dup_candidates(idx, new, k=kk, bands=bb, n=nn, scheme=stamp)
    # round 12 (VERDICT r11 #5): a stamp-less call REFUSES by default —
    # the k/n blind spot of the max(band) fallback is not silently
    # accepted — and the error names the stamp-writing recovery
    with pytest.raises(ValueError, match="read_index_scheme"):
        new_doc_dup_candidates(idx, new, k=8, bands=4, n=3)
    with pytest.raises(ValueError, match="minhash_band_scheme"):
        new_doc_dup_candidates(idx, new, k=8, bands=4, n=3)
    # explicit trust_banding opt-out still runs the max(band) scalar
    # check, which catches a bands drift
    with pytest.raises(ValueError, match="band ids"):
        new_doc_dup_candidates(idx, new, k=8, bands=8, n=3, trust_banding=True)
    # trusted path with matching parameters works (in-session tables)
    got_t = {
        (r.new_doc_id, r.doc_id)
        for r in new_doc_dup_candidates(
            idx, new, k=8, bands=4, n=3, trust_banding=True
        ).collect()
    }
    assert got_t == got
    # a future-version stamp carrying extra metadata keys still passes
    # when kind/k/bands/n match (round-11 ADVICE: per-field comparison)
    fwd = dict(stamp, built_by="v99", note="extra")
    got_f = {
        (r.new_doc_id, r.doc_id)
        for r in new_doc_dup_candidates(
            idx, new, k=8, bands=4, n=3, scheme=fwd
        ).collect()
    }
    assert got_f == got


def test_portable_pattern_guard_escape_parity(spark):
    """Round 12: the portability guard tracks escape parity and
    character-class state — closing the VERDICT r11 false negative
    (``\\\\*+`` passed: possessive star on a literal backslash) and the
    ADVICE false positives (quantifier chars inside a class; a literal
    escaped backslash before a digit)."""
    import pytest

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        _portability_violation,
        pattern_spans,
    )

    docs = _docs(spark)
    # Java-valid, RE2-invalid possessive star on an escaped backslash:
    # must raise BEFORE any engine sees it
    with pytest.raises(ValueError, match="possessive"):
        pattern_spans(docs, {"x": r"\\*+"})
    # plain possessives still refused
    for pat in (r"a*+", r"a++", r"a?+", r"[ab]{1,2}+"):
        assert _portability_violation(pat) is not None, pat
    # lookaround/backrefs still refused
    for pat in (r"(?=a)b", r"(?!a)b", r"(?<x>a)", r"(?>ab)", r"(a)\1"):
        assert _portability_violation(pat) is not None, pat
    # ADVICE false positives now pass: quantifier chars inside a
    # character class are literals; an escaped backslash before a
    # digit is not a backreference; lazy quantifiers are portable
    for pat in (
        r"^[*+]+$",
        r"^[^*+]+$",
        r"^[]*+]+$",
        r"\\1",
        r"a*?b",
        r"a{1,3}?b",
        r"^a\+*$",
        r"^\+?[0-9]{1,4}(-[0-9]{1,10}){1,5}$",
    ):
        assert _portability_violation(pat) is None, pat


def test_block_scheme_stamp_width_validation():
    """Round-11 ADVICE: a corrupted stamp whose widths don't tile the
    signature (sum != nbits, or zero/negative widths) refuses instead
    of silently blocking the delta on wrong bit extents."""
    import pytest

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        _banding_from_scheme,
        hamming_block_scheme,
    )

    good = hamming_block_scheme(3, 64, 16)
    widths, combos = _banding_from_scheme(good)
    assert sum(widths) == 64 and len(combos) == good["n_combos"]
    bad_sum = dict(good, widths=[w - 1 for w in good["widths"]])
    with pytest.raises(ValueError, match="inconsistent"):
        _banding_from_scheme(bad_sum)
    ws = list(good["widths"])
    ws[0], ws[1] = 0, ws[0] + ws[1]
    with pytest.raises(ValueError, match="inconsistent"):
        _banding_from_scheme(dict(good, widths=ws))


def test_portable_pattern_guard_rejects_re2_named_groups():
    """Round-12 review: (?P<name>...) is RE2/PCRE-only — Java rlike
    errors on it at runtime, so the guard must refuse it up front like
    the Java-only constructs."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
        _portability_violation,
    )

    assert _portability_violation(r"(?P<d>[0-9]+)") is not None
    # non-capturing groups and inline flags stay portable
    assert _portability_violation(r"(?:ab)+c") is None
    assert _portability_violation(r"(?i)abc") is None


def test_connected_components_bounded_matches_iterative(spark):
    """Round 16: the bounded-domain driver-side closure must produce
    labels IDENTICAL to the iterative pointer-jump propagation —
    chains, cliques, singleton-pair components, and an empty input."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.components import (
        connected_components,
        connected_components_bounded,
    )

    edges = (
        [(i, i + 1) for i in range(1, 40)]  # 40-node path
        + [(100 + a, 100 + b) for a in range(6) for b in range(a + 1, 6)]
        + [(500, 501)]
        # out-of-order unions: min label arrives through a later edge
        + [(900, 901), (800, 900), (700, 800)]
    )
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    want = {
        r.node: r.component for r in connected_components(pairs).collect()
    }
    got = {
        r.node: r.component
        for r in connected_components_bounded(pairs, bound=1000).collect()
    }
    assert got == want

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components_bounded(empty, bound=10).count() == 0


def test_connected_components_bounded_enforces_bound(spark):
    import pytest

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.components import (
        connected_components_bounded,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 20)], "doc_a long, doc_b long"
    )
    with pytest.raises(ValueError, match="domain bound"):
        connected_components_bounded(pairs, bound=5)
