from __future__ import annotations

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.similarity import (
    brute_force_topk,
    bucketed_ann_topk,
)


def _emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite bucket of 0
        (4, [0.8, 0.2, 0.1, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_ranks_by_cosine(spark):
    emb = _emb(spark)
    q = emb.filter("vec_id = 0")
    got = brute_force_topk(emb, q, k=2).orderBy("rank").collect()
    assert [r.vec_id for r in got] == [1, 4]
    assert got[0].rank == 1 and got[0].cos_r > got[1].cos_r


def test_bucketed_ann_excludes_other_buckets(spark):
    emb = _emb(spark)
    q = emb.filter("vec_id = 0")
    got = bucketed_ann_topk(emb, q, k=4, nbits=1).collect()
    ids = {r.vec_id for r in got}
    assert 3 not in ids  # negative first dim → different bucket
    assert 1 in ids
