"""Streaming corpus curation: foreachBatch + broadcast static benchmark
set, with batch/stream parity as the contract."""

from __future__ import annotations

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.streaming.curation import (
    benchmark_gram_set,
    curate_stream,
    run_curation_stream,
)

SCHEMA = "doc_id long, text string"

BENCH = [(100, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")]
BATCH_1 = [
    (1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),   # verbatim benchmark -> dropped
    (2, " ".join(f"a{i}" for i in range(20))),  # clean
]
BATCH_2 = [
    (3, " ".join(f"b{i}" for i in range(20))),  # clean
    (4, "tiny"),                                 # below token floor -> dropped
    (5, "c1 c2 c3 c4 c5 c6"),  # 6 words: zero 8-grams, passes gates -> KEPT
]


def test_stream_matches_batch(spark, tmp_path):
    bench = benchmark_gram_set(spark.createDataFrame(BENCH, SCHEMA))
    src = str(tmp_path / "docs")
    for rows in (BATCH_1, BATCH_2):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    batch_out = {
        r.doc_id: r
        for r in curate_stream(spark.read.parquet(src), bench, min_quality=0.0).collect()
    }

    got = {}

    def sink(df, epoch_id):
        for r in df.collect():
            got[r.doc_id] = r

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = run_curation_stream(stream, bench, sink, str(tmp_path / "ckpt"), min_quality=0.0)
    q.awaitTermination(120)

    assert set(got) == set(batch_out) == {2, 3, 5}
    for k in got:
        assert got[k].n_hit == batch_out[k].n_hit == 0
        assert got[k].n_grams == batch_out[k].n_grams
    # sub-shingle-width doc is kept as uncontaminated, not exploded away
    assert got[5].n_grams == 0 and got[5].n_tokens == 6


def test_redacted_stream_matches_batch(spark, tmp_path):
    """Round 11: the curation gate composed with the PII redaction map
    must produce identical survivor rows (verdict + masked text) batch
    vs foreachBatch under file splits — redaction is stateless, so
    parity is structural, and the test pins that the composition
    keeps it so."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.streaming.curation import (
        curate_redact_stream,
    )

    bench = benchmark_gram_set(spark.createDataFrame(BENCH, SCHEMA))
    rows_1 = [
        (1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),  # contaminated -> dropped
        (2, " ".join(f"a{i}" for i in range(18)) + " mail bob@x.org"),
    ]
    rows_2 = [
        (3, " ".join(f"b{i}" for i in range(18)) + " call +86-21-5550001"),
        (4, "tiny"),  # below token floor -> dropped
    ]
    src = str(tmp_path / "docs")
    for rows in (rows_1, rows_2):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    batch_out = {
        r.doc_id: (r.n_redacted, r.redacted_text, r.n_hit)
        for r in curate_redact_stream(
            spark.read.parquet(src), bench, min_quality=0.0
        ).collect()
    }

    got = {}

    def sink(df, epoch_id):
        for r in df.collect():
            got[r.doc_id] = (r.n_redacted, r.redacted_text, r.n_hit)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )

    def _process(batch_df, epoch_id):
        sink(curate_redact_stream(batch_df, bench, min_quality=0.0), epoch_id)

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert set(got) == set(batch_out) == {2, 3}
    assert got == batch_out
    assert got[2][1].endswith("mail <EMAIL>")
    assert got[3][1].endswith("call <PHONE>")


def test_full_gate_stream_batch_parity(spark, tmp_path):
    """Round 13: the full per-doc gate set (langid + quality +
    repetition + charlm) must produce the SAME kept set whether run
    as one batch plan or driven file-by-file through foreachBatch
    with a pre-trained charlm table — stateless gates, so any split
    of the corpus into micro-batches is invisible."""
    from pyspark.sql import functions as F

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.functions.charlm import (
        char_trigram_lm,
    )
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
        load_table,
    )
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.streaming.curation import (
        full_gate_stream,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    table = char_trigram_lm(docs)

    batch_kept = {
        r.doc_id: (r.n_tokens, r.quality, r.top_word_frac, r.mean_p)
        for r in full_gate_stream(docs, table).collect()
    }
    assert 0 < len(batch_kept) < docs.count()  # non-vacuous gates

    src = str(tmp_path / "docs")
    rows = docs.collect()
    third = max(1, len(rows) // 3)
    for i in range(0, len(rows), third):
        spark.createDataFrame(
            rows[i : i + third], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)

    got = {}

    def sink(batch_df, epoch_id):
        for r in full_gate_stream(batch_df, table).collect():
            got[r.doc_id] = (r.n_tokens, r.quality, r.top_word_frac, r.mean_p)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert got == batch_kept


def test_dsir_select_stream_batch_parity(spark, tmp_path):
    """Round 14: DSIR selection-on-ingest must produce the SAME
    (score, rate, keep) verdicts whether run as one batch plan or
    driven file-by-file through foreachBatch — the ratio table and
    the min/max normalizers are frozen at training time, so verdicts
    are per-doc pure functions and micro-batch boundaries are
    invisible."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.functions.dsir import (
        dsir_select,
    )
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
        load_table,
    )
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.streaming.curation import (
        dsir_select_stream,
    )

    sf = "/root/testdata/sf0.001"
    docs = entrymod._plant_scored_docs(load_table(spark, sf, "documents"))
    ratios = entrymod._dsir_ratios_cached(spark, sf)
    stats = (
        entrymod.queries()["dsir_scores"](spark, sf)
        .agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
        .first()
    )

    batch = {
        r.doc_id: (r.n_feats, r.score, r.rate, r.keep)
        for r in dsir_select(
            docs, ratios, stats.lo, stats.hi
        ).collect()
    }
    assert batch and any(v[3] for v in batch.values())
    assert any(not v[3] for v in batch.values())  # non-vacuous both ways

    src = str(tmp_path / "docs")
    rows = docs.select("doc_id", "text").collect()
    third = max(1, len(rows) // 3)
    for i in range(0, len(rows), third):
        spark.createDataFrame(
            rows[i : i + third], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)

    got = {}

    def sink(batch_df, epoch_id):
        for r in dsir_select_stream(
            batch_df, ratios, stats.lo, stats.hi
        ).collect():
            got[r.doc_id] = (r.n_feats, r.score, r.rate, r.keep)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert got == batch


def test_multiscript_gate_stream_parity(spark, tmp_path):
    """Round 15: the multilingual gate set on a stream — CJK/Thai docs
    survive (the whitespace gates would floor-reject them), off-mix
    languages drop, and any micro-batch split is invisible."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.streaming.curation import (
        multiscript_gate_stream,
    )

    ZH = "在上海这个城市里很多人每天早上都会去公园散步然后喝茶聊天看看风景"
    RU = ("в москве сегодня хорошая погода и многие люди гуляют в парке "
          "чтобы посмотреть на осенние листья и это приятно")
    EL = "στην αθήνα οι άνθρωποι περπατούν στους δρόμους και μιλούν για τον καιρό"
    # no word repeats 3x: the multilingual top-word gate is 0.15
    EN = "a quick brown fox jumped over one lazy dog and then ran to that park happily"
    b1 = [(1, ZH), (2, RU)]
    b2 = [(3, EL), (4, EN), (5, "tiny")]
    src = str(tmp_path / "msdocs")
    for rows in (b1, b2):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    batch_out = {
        r.doc_id: r
        for r in multiscript_gate_stream(spark.read.parquet(src)).collect()
    }

    got = {}

    def sink(df, epoch_id):
        for r in df.collect():
            got[r.doc_id] = r

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        multiscript_gate_stream(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "msckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # zh survives (continua routing), ru survives (cyrillic in mix),
    # el is off-mix, 'tiny' under the token floor
    assert set(got) == set(batch_out) == {1, 2, 4}
    for k in got:
        assert tuple(got[k]) == tuple(batch_out[k])
    assert got[1].pred == "zh" and got[1].cont == 1
    assert got[2].pred == "ru" and got[2].cont == 0
    assert got[4].pred == "en"
