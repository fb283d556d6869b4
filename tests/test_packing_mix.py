from __future__ import annotations

import pyspark.sql.functions as F

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.functions.sampling import (
    domain_mix_keep,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.dedup import (
    duplicated_block_stats,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.packing import (
    pack_sequences,
    pack_stats,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.plans import (
    assert_no_python_udf,
    physical_plan,
)


def test_pack_sequences_prefix_rule(spark):
    df = spark.createDataFrame(
        [(0, 300), (1, 300), (2, 300), (3, 600), (4, 100)],
        "doc_id long, n_tokens long",
    )
    packed = pack_sequences(df, budget=512, shards=1)
    bins = {r.doc_id: r.bin for r in packed.collect()}
    # prefix sums before each doc: 0, 300, 600, 900, 1500 -> //512
    assert bins == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}


def test_pack_sequences_shard_local_window(spark):
    df = spark.createDataFrame(
        [(i, 100) for i in range(64)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(df, budget=512, shards=32)
    plan = physical_plan(packed)
    # the pack window partitions by shard -- never a global orderBy
    assert "Window" in plan
    assert "SinglePartition" not in plan
    assert_no_python_udf(packed)
    stats = pack_stats(packed)
    rows = stats.collect()
    # 64 docs over 32 shards: 2 docs (200 tokens) per shard, one bin each
    assert len(rows) == 32
    assert all(r.n_docs == 2 and r.total_tokens == 200 for r in rows)


def test_duplicated_block_stats_planted(spark):
    shared = " ".join(f"w{i}" for i in range(10))
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, shared + " " + uniq_a),  # 2 blocks, 1 duplicated
            (2, shared + " " + uniq_b),  # 2 blocks, 1 duplicated
            (3, " ".join(f"c{i}" for i in range(25))),  # 2 blocks, 0 dup
            (4, "too short"),  # < 10 words -> no rows
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicated_block_stats(docs).collect()}
    assert out[1].n_blocks == 2 and out[1].n_dup_blocks == 1
    assert out[2].dup_frac == 0.5
    assert out[3].n_dup_blocks == 0
    assert 4 not in out


def test_domain_mix_keep_rates_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "web" if i % 2 == 0 else "wiki") for i in range(4000)],
        "doc_id long, domain string",
    )
    keep = domain_mix_keep(F.col("doc_id"), F.col("domain"), {"web": 0.25, "wiki": 1.0})
    kept = df.filter(keep)
    counts = {r.domain: r.n for r in kept.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert counts["wiki"] == 2000  # rate 1.0 keeps everything
    assert 350 < counts["web"] < 650  # ~25% of 2000, hash-uniform
    # repartitioning never changes membership
    kept2 = df.repartition(13).filter(keep)
    assert kept2.count() == kept.count()
    # unknown domains default to dropped
    other = spark.createDataFrame([(1, "books")], "doc_id long, domain string")
    assert other.filter(
        domain_mix_keep(F.col("doc_id"), F.col("domain"), {"web": 0.5})
    ).count() == 0
