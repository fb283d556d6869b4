from __future__ import annotations

import hashlib

from conftest import SF_SMALL

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.multimodal import (
    attach_binary_payload,
    extract_media_meta,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
    load_events,
    load_table,
)
from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.streaming import (
    streaming_occupancy,
)

import pyspark.sql.functions as F


def test_streaming_occupancy_matches_batch(spark):
    got = streaming_occupancy(spark, SF_SMALL)
    batch = (
        load_events(spark, SF_SMALL)
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_media_meta_deterministic_and_batchwise(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    meta = extract_media_meta(attach_binary_payload(docs)).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert len(meta) == len(texts)
    for r in meta:
        d = hashlib.md5(texts[r.doc_id].encode()).hexdigest()
        assert r.digest == d
        assert r.n_bytes == len(texts[r.doc_id].encode())
        hexv = "0123456789abcdef"
        assert r.fake_width == hexv.index(d[0]) * 16 + hexv.index(d[1])


def test_frame_sampling_windows_and_exclusions(spark):
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.multimodal import (
        sample_frames,
    )

    docs = spark.createDataFrame(
        [
            (1, "a" * 200),   # 3 complete 64-byte frames -> idx 0, 2 sampled
            (2, "b" * 63),    # shorter than one frame -> no rows
            (3, "c" * 64),    # exactly one frame -> idx 0
        ],
        "doc_id long, text string",
    )
    out = sample_frames(attach_binary_payload(docs)).collect()
    got = {(r.doc_id, r.frame_idx): r for r in out}
    assert set(got) == {(1, 0), (1, 2), (3, 0)}
    for (doc_id, idx), r in got.items():
        txt = {1: "a" * 200, 3: "c" * 64}[doc_id]
        frame = txt.encode()[idx * 64 : (idx + 1) * 64]
        assert r.n_frame_bytes == 64
        assert r.frame_digest == hashlib.md5(frame).hexdigest()
