"""Invariant laws for the batch-11 corpus statistics queries."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

import __spark_entry__ as entrymod
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.functions import (
    text as tx,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
    load_table,
)
from conftest import SF_SMALL


def _run(spark, name):
    return entrymod.queries()[name](spark, SF_SMALL)


def test_chi2_keywords_shape_and_positivity(spark):
    rows = _run(spark, "chi2_keywords").collect()
    by_source = {}
    for r in rows:
        # chi2 is finite and positive; support threshold honored
        assert r.chi2 > 0 and math.isfinite(r.chi2)
        assert r.n_in_source >= 5
        by_source.setdefault(r.source, []).append(r)
    for src, rs in by_source.items():
        # at most 5 ranked keywords per source, ranks 1..k, chi2
        # nonincreasing in rank
        rs = sorted(rs, key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        chis = [r.chi2 for r in rs]
        assert chis == sorted(chis, reverse=True)


def test_zipf_token_rank_is_the_exact_head(spark):
    rows = sorted(_run(spark, "zipf_token_rank").collect(), key=lambda r: r.rnk)
    # counts nonincreasing in rank, rank_cnt consistent
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    for r in rows:
        assert r.rank_cnt == r.rnk * r.cnt
    # total head mass never exceeds the corpus token count
    docs = load_table(spark, SF_SMALL, "documents")
    n_tokens = (
        docs.select(F.size(tx.tokens(F.col("text"))).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(cnts) <= n_tokens


def test_bigram_next_token_is_a_conditional_mode(spark):
    rows = _run(spark, "bigram_next_token").collect()
    assert rows, "expected at least one frequent head"
    for r in rows:
        assert r.head_n >= 20 and 0 < r.pair_n <= r.head_n
        assert math.isclose(r.prob, r.pair_n / r.head_n)
    # one successor per head
    heads = [r.w1 for r in rows]
    assert len(heads) == len(set(heads))


def test_type_token_ratio_bounds(spark):
    rows = _run(spark, "type_token_ratio").collect()
    for r in rows:
        assert 0 < r.n_types <= r.n_tokens
        assert math.isclose(r.ttr, r.n_types / r.n_tokens)
        assert 0.0 < r.ttr <= 1.0


def test_ols_value_trend_matches_numpy(spark):
    import numpy as np

    rows = _run(spark, "ols_value_trend").collect()
    assert rows
    ev = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", F.hour("ts").alias("x"), "value")
        .collect()
    )
    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append((r.x, r.value))
    for r in rows:
        assert 0.0 <= r.r2 <= 1.0
        xs, ys = zip(*by_type[r.event_type])
        slope, intercept = np.polyfit(np.array(xs, float), np.array(ys, float), 1)
        # engine value is decimal(18,4)-quantized; polyfit is raw —
        # agree to ~1e-4 absolute (the quantization scale)
        assert abs(r.slope - slope) < 1e-3
        assert abs(r.intercept - intercept) < 1e-2
        assert r.n == len(xs)


def test_benford_digits_shares_partition(spark):
    import math

    rows = _run(spark, "benford_digits").collect()
    assert rows
    by_type = {}
    for r in rows:
        assert 0 <= r.lead_digit <= 9
        by_type.setdefault(r.event_type, []).append(r)
    ev = load_table(spark, SF_SMALL, "events").filter(
        F.col("value").isNotNull() & (F.col("value") != 0)
    )
    totals = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    for t, rs in by_type.items():
        assert sum(r.cnt for r in rs) == totals[t]
        assert math.isclose(sum(r.share for r in rs), 1.0, rel_tol=1e-12)


def test_countmin_never_underestimates(spark):
    rows = _run(spark, "countmin_heavy_hitters").collect()
    # exact top-20 probe set (sf0.001 has only 15 users in total)
    assert 0 < len(rows) <= 20
    for r in rows:
        # the CMS guarantee: estimate >= truth, always
        assert r.cms_estimate >= r.exact_cnt > 0


def test_occupancy_autocorrelation_is_a_correlation(spark):
    rows = _run(spark, "occupancy_autocorrelation").collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.r1 <= 1.0
        assert r.n_pairs > 0


def test_vocab_growth_curve_conserves_totals(spark):
    import pyspark.sql.functions as F2

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.functions import (
        text as tx2,
    )

    rows = sorted(
        _run(spark, "vocab_growth_curve").collect(), key=lambda r: r.bucket
    )
    assert [r.bucket for r in rows] == sorted({r.bucket for r in rows})
    assert rows[-1].cum_tokens == sum(r.n_tokens for r in rows)
    assert rows[-1].cum_types == sum(r.new_types for r in rows)
    docs = load_table(spark, SF_SMALL, "documents")
    toks = docs.select(F2.explode(tx2.tokens(F2.col("text"))).alias("w"))
    assert rows[-1].cum_tokens == toks.count()
    assert rows[-1].cum_types == toks.distinct().count()
    # the curve is a growth curve: cumulative types never decrease
    cts = [r.cum_types for r in rows]
    assert cts == sorted(cts)


def test_hub_dependence_is_a_share_of_outflow(spark):
    rows = entrymod.queries()["hub_dependence"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.region != r.top_dest
        assert 0 < r.top_flow <= r.out_flow
        assert math.isclose(r.dependence, r.top_flow / r.out_flow)
