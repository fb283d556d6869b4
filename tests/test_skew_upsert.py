from __future__ import annotations

import pyspark.sql.functions as F

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.skew import (
    salted_count,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.upsert import (
    merge_upsert,
)


def test_salted_count_equals_plain_count(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("u")
    )
    got = {r.k: r.cnt for r in salted_count(df, ["k"], "u", 16).collect()}
    want = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    assert got == want


def test_salted_count_spreads_hot_key(spark):
    # all rows share one key — phase 1 must produce multiple partials
    df = spark.range(0, 1000).select(F.lit(0).alias("k"), F.col("id").alias("u"))
    salt = F.pmod(F.xxhash64(F.col("u")), F.lit(16)).alias("__salt")
    n_partials = df.groupBy("k", salt).count().count()
    assert n_partials == 16
    assert salted_count(df, ["k"], "u", 16).collect()[0].cnt == 1000


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, name string, v long"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21), (4, "d", 40)], "k long, name string, v long"
    )
    out = {r.k: (r.name, r.v) for r in merge_upsert(target, updates, ["k"]).collect()}
    assert out == {1: ("a", 10), 2: ("b2", 21), 3: ("c", 30), 4: ("d", 40)}


def test_merge_upsert_idempotent(spark):
    target = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    updates = spark.createDataFrame([(2, 21)], "k long, v long")
    once = merge_upsert(target, updates, ["k"])
    twice = merge_upsert(once, updates, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
