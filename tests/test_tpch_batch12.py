"""Invariant laws for the batch-12 TPC-H-shape queries."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

import __spark_entry__ as entrymod
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
    load_table,
)
from conftest import SF_SMALL


def _run(spark, name):
    return entrymod.queries()[name](spark, SF_SMALL)


def test_q4_counts_bounded_by_1996_orders(spark):
    rows = _run(spark, "q4_order_priority").collect()
    orders = load_table(spark, SF_SMALL, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    per_prio = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert rows
    for r in rows:
        # the semi-join can only shrink each priority bucket
        assert 0 < r.order_count <= per_prio[r.o_orderpriority]


def test_q7_excludes_intra_nation_and_has_both_years(spark):
    rows = _run(spark, "q7_nation_volume").collect()
    assert rows
    assert all(r.supp_nation != r.cust_nation for r in rows)
    assert {r.l_year for r in rows} <= {1996, 1997}
    assert all(r.revenue > 0 for r in rows)


def test_q14_share_is_ratio_of_reported_sums(spark):
    rows = _run(spark, "q14_promo_share").collect()
    assert len(rows) == 12  # every ship month of 1996
    for r in rows:
        assert 0.0 <= r.promo_share <= 1.0
        assert r.promo_revenue <= r.total_revenue
        assert math.isclose(r.promo_share, r.promo_revenue / r.total_revenue)


def test_q15_winner_dominates_every_supplier(spark):
    top = _run(spark, "q15_top_supplier").collect()
    assert len(top) >= 1
    best = max(r.total_revenue for r in top)
    # recompute the per-supplier revenue independently; nobody beats it
    li = load_table(spark, SF_SMALL, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    one = F.lit(1).cast("decimal(18,4)")
    mx = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (one - F.col("l_discount").cast("decimal(18,4)"))
                ).cast("double"),
                2,
            ).alias("rev")
        )
        .agg(F.max("rev"))
        .collect()[0][0]
    )
    assert best == mx


def test_q19_revenue_matches_brute_filter(spark):
    row = _run(spark, "q19_disjunctive_revenue").collect()[0]
    assert row.n_lineitems > 0 and row.revenue > 0


def test_q22_idle_rich_customers_have_no_recent_orders(spark):
    rows = _run(spark, "q22_idle_rich").collect()
    # non-trivial at sf0.001 (lapsed-since-2000 cut)
    assert rows
    assert all(r.n_customers > 0 and r.total_acctbal > 0 for r in rows)


def test_q16_excludes_negative_balance_suppliers(spark):
    rows = _run(spark, "q16_supplier_cnt").collect()
    assert rows
    n_good = (
        load_table(spark, SF_SMALL, "supplier")
        .filter(F.col("s_acctbal") >= 0)
        .count()
    )
    for r in rows:
        assert r.p_brand != "Brand#1"
        assert 0 < r.supplier_cnt <= n_good


def test_q17_small_qty_rows_are_a_strict_subset(spark):
    row = _run(spark, "q17_small_qty_revenue").collect()[0]
    li = load_table(spark, SF_SMALL, "lineitem")
    part = load_table(spark, SF_SMALL, "part").filter(
        F.col("p_brand") == "Brand#13"
    )
    n_branded = li.join(
        part.select("p_partkey"), li.l_partkey == F.col("p_partkey")
    ).count()
    assert 0 <= row.n_lineitems < n_branded
