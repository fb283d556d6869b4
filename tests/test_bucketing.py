"""Bucketed co-located join — the shuffle-elimination strategy SCALE.md
prescribes for repeated large-large joins (SURVEY.md §4 bucketing note).

Both sides written bucketed on the join key into a local warehouse →
the join plan must contain NO Exchange (shuffle) at all.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_SMALL

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.plans import (
    physical_plan,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
    load_table,
)


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cust = load_table(spark, SF_SMALL, "customer")
        orders = load_table(spark, SF_SMALL, "orders")
        cust.write.mode("overwrite").bucketBy(4, "c_custkey").sortBy(
            "c_custkey"
        ).saveAsTable("cust_b")
        orders.withColumn("o_custkey2", F.col("o_custkey")).write.mode(
            "overwrite"
        ).bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")

        joined = spark.table("orders_b").join(
            spark.table("cust_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = physical_plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS cust_b")
        spark.sql("DROP TABLE IF EXISTS orders_b")
