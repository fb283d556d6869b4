from __future__ import annotations

import pyspark.sql.functions as F

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.decontam import (
    decontaminate,
    word_ngrams,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.plans import (
    assert_no_python_udf,
)


def test_word_ngrams_basic_and_short(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",)], "text string"
    ).select(word_ngrams(F.col("text"), 3).alias("g"))
    rows = df.collect()
    assert rows[0].g == ["a b c", "b c d"]
    assert rows[1].g == []  # shorter than n -> empty, never a descending sequence


def test_decontaminate_flags_planted_overlap(spark):
    bench_text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = spark.createDataFrame(
        [
            (0, bench_text),  # benchmark doc
            # full verbatim inclusion -> every gram hits
            (1, bench_text),
            # one shared 8-gram (w1..w8) inside otherwise-novel text
            (2, "x1 x2 w1 w2 w3 w4 w5 w6 w7 w8 x3 x4"),
            # no overlap
            (3, "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"),
        ],
        "doc_id long, text string",
    )
    out = decontaminate(docs, F.col("doc_id") == 0, n=8)
    assert_no_python_udf(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # benchmark gram set broadcasts
    by_id = {r.doc_id: r for r in out.collect()}
    assert by_id[1].contaminated and by_id[1].n_hit == by_id[1].n_grams
    assert by_id[2].n_hit == 1 and by_id[2].contaminated  # 1/5 >= 10%
    assert by_id[3].n_hit == 0 and not by_id[3].contaminated
    assert 0 not in by_id  # benchmark docs are excluded from the report
