"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship occupancy query (smoke, sf0.001).
``queries()`` — named (spark, sf_dir) -> DataFrame callables, one per
implemented operator from SURVEY.md §2 + north-star extensions.
``oracle_sql()`` — DuckDB-runnable ANSI SQL twins.

Cross-engine determinism rules used throughout (so the driver's
order-insensitive value hash matches bit-for-bit):
- grouped SUMs of doubles go through DECIMAL (exact, association-order
  independent) and are cast back to DOUBLE at the end;
- array math folds sequentially left-to-right on both sides
  (F.aggregate ↔ list_reduce);
- ranking ties always broken by an explicit unique key;
- trig-heavy outputs (haversine) are bucketed coarsely enough that a
  1-ulp libm divergence cannot flip a bucket.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark as shflow  # noqa: E402
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark import (  # noqa: E402
    operators as ops,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.functions import (  # noqa: E402
    text as tx,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.session import (  # noqa: E402
    tune_for_session,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (  # noqa: E402
    events_as_pings,
    load_table,
)

N_REGIONS = 20
REGION_SQL = f"(CAST(floor(value) AS BIGINT) % {N_REGIONS}) + 1"

# Shared oracle CTE: events → deterministic hourly positions (latest
# event per user-hour) — mirror of sources.events_as_pings +
# operators.trajectory.hourly_positions.
POSITIONS_CTE = f"""
pos AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         CAST({REGION_SQL} AS INTEGER) AS region_id
  FROM events
  QUALIFY row_number() OVER (
    PARTITION BY user_id, date_trunc('hour', ts)
    ORDER BY ts DESC, event_id DESC) = 1
)
"""

# Shared oracle CTE: positions → gap-filled trajectory edges — mirror of
# operators.trajectory.gap_fill_edges (five _add_records branches,
# /root/reference/cal_mobility_matrix.py:105-127).
EDGES_CTE = (
    POSITIONS_CTE
    + """,
ctx AS (
  SELECT user_id, hour, region_id,
         lag(hour) OVER w AS pre_hour,
         lag(region_id) OVER w AS pre_region_id,
         lead(hour) OVER w AS next_hour,
         date_diff('hour', lag(hour) OVER w, hour) AS gap
  FROM pos WINDOW w AS (PARTITION BY user_id ORDER BY hour)
),
edges AS (
  SELECT user_id, region_id, hour,
         hour - INTERVAL 1 HOUR AS pre_hour, 0 AS pre_region_id
  FROM ctx WHERE pre_hour IS NULL
  UNION ALL
  SELECT user_id, region_id, hour, pre_hour, pre_region_id
  FROM ctx WHERE gap = 1
  UNION ALL
  SELECT user_id, pre_region_id AS region_id,
         pre_hour + i * INTERVAL 1 HOUR AS hour,
         pre_hour + (i - 1) * INTERVAL 1 HOUR AS pre_hour,
         pre_region_id
  FROM (SELECT *, unnest(generate_series(1, CAST(gap AS BIGINT) - 1)) AS i
        FROM ctx WHERE gap > 1 AND gap <= 24)
  UNION ALL
  SELECT user_id, region_id, hour, hour - INTERVAL 1 HOUR, pre_region_id
  FROM ctx WHERE gap > 1 AND gap <= 24
  UNION ALL
  SELECT user_id, 0, pre_hour + INTERVAL 1 HOUR, pre_hour, pre_region_id
  FROM ctx WHERE gap > 24
  UNION ALL
  SELECT user_id, region_id, hour, hour - INTERVAL 1 HOUR, 0
  FROM ctx WHERE gap > 24
  UNION ALL
  SELECT user_id, 0, hour + INTERVAL 1 HOUR, hour, region_id
  FROM ctx WHERE next_hour IS NULL
)
"""
)

NIGHT_ANCHORS_CTE = f"""
npos AS (
  SELECT user_id, ts, CAST({REGION_SQL} AS INTEGER) AS region_id,
         CASE WHEN hour(ts) <= 8 THEN CAST(ts AS DATE) - 1
              ELSE CAST(ts AS DATE) END AS night
  FROM events
  WHERE hour(ts) >= 19 OR hour(ts) <= 8
),
anchors AS (
  SELECT user_id, night, region_id
  FROM npos
  QUALIFY row_number() OVER (
    PARTITION BY user_id, night ORDER BY ts ASC, region_id ASC) = 1
)
"""


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,4)")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hourly region occupancy (distinct users per region-hour)
    on sf0.001 — the reference's first real query (cal_user_trace.py:35),
    744 driver-loop jobs collapsed into one groupBy."""
    tune_for_session(spark)
    pings = events_as_pings(spark, "/root/testdata/sf0.001", N_REGIONS)
    return ops.occupancy(pings)


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def _q_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    pings = events_as_pings(spark, sf_dir, N_REGIONS)
    return ops.occupancy(pings)


def _q_hourly_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.hourly_positions(events_as_pings(spark, sf_dir, N_REGIONS))


def _q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    pos = ops.hourly_positions(events_as_pings(spark, sf_dir, N_REGIONS))
    return ops.gap_fill_edges(pos)


def _q_od_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    pos = ops.hourly_positions(events_as_pings(spark, sf_dir, N_REGIONS))
    return ops.od_matrix(ops.gap_fill_edges(pos))


def _q_od_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    pos = ops.hourly_positions(events_as_pings(spark, sf_dir, N_REGIONS))
    return ops.od_fractions(ops.od_matrix(ops.gap_fill_edges(pos)))


def _q_home_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.home_location(events_as_pings(spark, sf_dir, N_REGIONS))


def _q_night_single_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.night_single_region_users(events_as_pings(spark, sf_dir, N_REGIONS))


def _q_mode_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ops.mode_per_group(ev, "user_id", "event_type")


def _q_user_activity_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.countDistinct(F.to_date("ts")).alias("n_days"))
        .filter(F.col("n_days") >= 25)
    )


def _q_json_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
        F.count("*").alias("n"),
    )


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias(
                "avg_price"
            ),
            F.count("*").alias("count_order"),
        )
    )


def _q_revenue_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def _q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
    )


def _q_parts_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
    )


def _q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def _q_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.exact_dedup(docs)


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        tx.token_count(F.col("text")).alias("n_tokens"),
        tx.stopword_ratio(toks).alias("stop_ratio"),
        tx.quality_score(F.col("text")).alias("quality"),
    )


def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ops.brute_force_topk(emb, queries, k=3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "occupancy_by_region_hour": _q_occupancy,
        "hourly_positions_latest": _q_hourly_positions,
        "trajectory_gap_fill": _q_gap_fill,
        "od_matrix": _q_od_matrix,
        "od_fractions": _q_od_fractions,
        "home_location": _q_home_location,
        "night_single_region_users": _q_night_single_region,
        "mode_event_type_per_user": _q_mode_event_type,
        "user_activity_having": _q_user_activity_having,
        "json_extract_stats": _q_json_extract_stats,
        "pricing_summary": _q_pricing_summary,
        "revenue_by_brand": _q_revenue_by_brand,
        "customers_without_orders": _q_customers_without_orders,
        "parts_with_lineitems": _q_parts_with_lineitems,
        "top_orders_per_customer": _q_top_orders_per_customer,
        "exact_dedup_docs": _q_exact_dedup_docs,
        "text_stats": _q_text_stats,
        "cosine_topk": _q_cosine_topk,
    }


# --------------------------------------------------------------------------
# oracle SQL (DuckDB dialect, ANSI-leaning)
# --------------------------------------------------------------------------

_STOPWORDS_SQL = "['" + "', '".join(tx.EN_STOPWORDS) + "']"

_TOKENS_SQL = (
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '')"
)


def oracle_sql() -> dict[str, str]:
    fold_sq = "list_reduce(list_transform({v}, x -> x * x), (a, b) -> a + b)"
    dot = (
        "list_reduce(list_transform(generate_series(1, len(q_emb)), "
        "i -> q_emb[i] * c_emb[i]), (a, b) -> a + b)"
    )
    cos = (
        f"round({dot} / (sqrt({fold_sq.format(v='q_emb')}) * "
        f"sqrt({fold_sq.format(v='c_emb')})), 6)"
    )
    return {
        "occupancy_by_region_hour": f"""
            SELECT CAST({REGION_SQL} AS INTEGER) AS region_id,
                   date_trunc('hour', ts) AS hour,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2
        """,
        "hourly_positions_latest": f"""
            WITH {POSITIONS_CTE}
            SELECT user_id, hour, region_id FROM pos
        """,
        "trajectory_gap_fill": f"""
            WITH {EDGES_CTE}
            SELECT user_id, region_id, hour, pre_hour, pre_region_id FROM edges
        """,
        "od_matrix": f"""
            WITH {EDGES_CTE}
            SELECT hour, pre_region_id AS orig, region_id AS dest,
                   count(*) AS cnt
            FROM edges GROUP BY 1, 2, 3
        """,
        "od_fractions": f"""
            WITH {EDGES_CTE},
            od AS (
              SELECT hour, pre_region_id AS orig, region_id AS dest,
                     count(*) AS cnt
              FROM edges GROUP BY 1, 2, 3
            )
            SELECT hour, orig, dest, cnt,
                   CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY hour, orig) AS frac
            FROM od
        """,
        "home_location": f"""
            WITH {NIGHT_ANCHORS_CTE},
            counted AS (
              SELECT user_id, region_id, count(*) AS n
              FROM anchors GROUP BY 1, 2
            )
            SELECT user_id, region_id AS home_region
            FROM counted
            QUALIFY row_number() OVER (
              PARTITION BY user_id ORDER BY n DESC, region_id ASC) = 1
        """,
        "night_single_region_users": f"""
            SELECT user_id, count(DISTINCT CAST({REGION_SQL} AS INTEGER)) AS n_regions
            FROM events
            WHERE hour(ts) >= 19 OR hour(ts) <= 8
            GROUP BY user_id HAVING n_regions = 1
        """,
        "mode_event_type_per_user": """
            WITH counted AS (
              SELECT user_id, event_type, count(*) AS n
              FROM events GROUP BY 1, 2
            )
            SELECT user_id, event_type
            FROM counted
            QUALIFY row_number() OVER (
              PARTITION BY user_id ORDER BY n DESC, event_type ASC) = 1
        """,
        "user_activity_having": """
            SELECT user_id, count(DISTINCT CAST(ts AS DATE)) AS n_days
            FROM events GROUP BY user_id HAVING n_days >= 25
        """,
        "json_extract_stats": """
            SELECT event_type,
                   CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
                   min(CAST(props->>'$.k' AS BIGINT)) AS k_min,
                   max(CAST(props->>'$.k' AS BIGINT)) AS k_max,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                            (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_brand": """
            SELECT p_brand,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                            (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "customers_without_orders": """
            SELECT c_nationkey, count(*) AS n_customers
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            GROUP BY c_nationkey
        """,
        "parts_with_lineitems": """
            SELECT p_brand, count(*) AS n_parts
            FROM part p
            WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
            GROUP BY p_brand
        """,
        "top_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
            FROM orders QUALIFY rn <= 3
        """,
        "exact_dedup_docs": """
            SELECT md5(text) AS digest, min(doc_id) AS canonical_id,
                   count(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "text_stats": f"""
            WITH t AS (
              SELECT doc_id, text,
                     {_TOKENS_SQL} AS toks,
                     regexp_replace(lower(text), '[a-z0-9 ]', '', 'g') AS stripped
              FROM documents
            )
            SELECT doc_id,
                   CAST(len(toks) AS INTEGER) AS n_tokens,
                   CASE WHEN len(toks) > 0
                        THEN len(list_filter(toks, t -> list_contains({_STOPWORDS_SQL}, t))) / len(toks)
                        ELSE 0.0 END AS stop_ratio,
                   (least(len(toks) / 100.0, 1.0)
                    + least((CASE WHEN len(toks) > 0
                             THEN len(list_filter(toks, t -> list_contains({_STOPWORDS_SQL}, t))) / len(toks)
                             ELSE 0.0 END) * 5.0, 1.0)
                    + (1.0 - (CASE WHEN length(text) > 0
                              THEN length(stripped) / length(text)
                              ELSE 0.0 END))) / 3.0 AS quality
            FROM t
        """,
        "cosine_topk": f"""
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS c_emb FROM embeddings
            ),
            q AS (
              SELECT vec_id AS query_id, c_emb AS q_emb FROM e WHERE vec_id < 5
            ),
            pairs AS (
              SELECT q.query_id, c.vec_id, {cos} AS cos_r
              FROM e c, q WHERE c.vec_id <> q.query_id
            )
            SELECT query_id, vec_id, cos_r,
                   CAST(row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY cos_r DESC, vec_id ASC) AS INTEGER) AS rank
            FROM pairs QUALIFY rank <= 3
        """,
    }
