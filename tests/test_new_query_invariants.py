"""Invariant tests for the late-round queries — laws the DuckDB oracle
also enforces, checked here directly so a failure localizes to the
Spark side without running the differential harness."""

from __future__ import annotations

import pyspark.sql.functions as F

import __spark_entry__ as entrymod

from conftest import SF_SMALL


def _run(spark, name):
    return entrymod.queries()[name](spark, SF_SMALL)


def test_dense_hourly_occupancy_is_complete_and_conserves(spark):
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
        load_table,
    )

    dense = _run(spark, "dense_hourly_occupancy")
    ev = load_table(spark, SF_SMALL, "events")
    span = ev.select(
        F.min(F.date_trunc("hour", "ts")).alias("h0"),
        F.max(F.date_trunc("hour", "ts")).alias("h1"),
    ).collect()[0]
    n_hours = int((span.h1 - span.h0).total_seconds() // 3600) + 1
    # spine completeness: exactly regions x hours cells, no nulls
    assert dense.count() == entrymod.N_REGIONS * n_hours
    assert dense.filter(F.col("n_users").isNull()).count() == 0
    # zero-fill conserves mass: dense total == sparse occupancy total
    sparse = _run(spark, "occupancy_by_region_hour")
    assert (
        dense.agg(F.sum("n_users")).collect()[0][0]
        == sparse.agg(F.sum("n_users")).collect()[0][0]
    )


def test_sliding_window_counts_double_count_law(spark):
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
        load_table,
    )

    out = _run(spark, "sliding_window_counts")
    n_events = load_table(spark, SF_SMALL, "events").count()
    # duration/slide = 2 -> every event lands in exactly two windows
    assert out.agg(F.sum("n")).collect()[0][0] == 2 * n_events
    # window geometry: end - start == 2h always
    bad = out.filter(
        F.col("win_end").cast("long") - F.col("win_start").cast("long") != 7200
    )
    assert bad.count() == 0


def test_corpus_curation_is_deduped_and_thresholded(spark):
    out = _run(spark, "corpus_curation")
    rows = out.collect()
    digests = [r.digest for r in rows]
    assert len(digests) == len(set(digests))  # one canonical doc per digest
    assert all(r.quality >= 0.5 and r.n_tokens >= 5 for r in rows)


def test_large_volume_customers_threshold(spark):
    rows = _run(spark, "large_volume_customers").collect()
    assert all(r.sum_qty > 300 for r in rows)
    # join-back preserves key uniqueness: one row per qualifying order
    assert len({r.o_orderkey for r in rows}) == len(rows)


def test_first_last_region_one_row_per_user_day(spark):
    out = _run(spark, "first_last_region_per_day")
    assert (
        out.groupBy("user_id", "day").count().filter(F.col("count") > 1).count()
        == 0
    )
    moved_mismatch = out.filter(
        F.col("moved") != (F.col("first_region") != F.col("last_region"))
    )
    assert moved_mismatch.count() == 0


def test_props_map_explode_covers_every_event(spark):
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
        load_table,
    )

    out = _run(spark, "props_map_explode").collect()
    n_events = load_table(spark, SF_SMALL, "events").count()
    # testdata props is single-key JSON -> exploded rows == events
    assert sum(r.n for r in out) == n_events


def test_rare_token_stats_relative_leg_fires_on_testdata(spark):
    """The <10%-prevalence rarity leg must be non-vacuous on the
    synthetic corpus (the absolute hapax leg cannot fire there — only
    31 shared tokens, min df = 5% of docs)."""
    out = _run(spark, "rare_token_stats")
    assert out.filter(F.col("n_rare") > 0).count() > 0
    assert out.filter(F.col("n_types") > 0).count() == out.count()


def test_rare_token_stats_hapax_and_boundary(spark):
    """Planted fixture: a unique token is a hapax; a token in exactly
    10% of docs is NOT 'rare' (strict cross-multiply), one under is."""
    import __spark_entry__ as m

    docs = spark.createDataFrame(
        # 10 docs: 'common'/'filler' in all (df=10, not rare);
        # 'unique0' only in doc 9 — a hapax (df=1), and at nd=10 its
        # cross-multiply sits exactly ON the boundary (1*10 < 10 is
        # false), proving hapax and rare are independent legs
        [(i, "common filler") for i in range(9)]
        + [(9, "common filler unique0")],
        "doc_id long, text string",
    )
    # direct operator-shape check without sf_dir plumbing: rebuild the
    # same plan inline on the fixture
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.functions import (
        text as tx,
    )

    n_docs = docs.agg(F.count("*").alias("__nd"))
    types = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tx.tokens(F.col("text")))).alias("tok"),
    )
    df_tab = types.groupBy("tok").agg(F.count("*").alias("df"))
    out = (
        types.join(df_tab, "tok")
        .crossJoin(n_docs)
        .groupBy("doc_id")
        .agg(
            F.sum((F.col("df") == 1).cast("int")).alias("n_hapax"),
            F.sum(
                (F.col("df") * F.lit(10) < F.col("__nd")).cast("int")
            ).alias("n_rare"),
        )
    )
    got = {r.doc_id: (r.n_hapax, r.n_rare) for r in out.collect()}
    # doc 9 holds the planted hapax; df=1, 1*10 < 10 is FALSE, so the
    # hapax is not 'rare' at nd=10 — the two legs are independent
    assert got[9] == (1, 0)
    assert got[0] == (0, 0)


def _oracle_rows(sql, view_dir, tables):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{view_dir}/{t}.parquet')"
        )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_collocations_survives_empty_and_one_token_docs(spark, tmp_path):
    """ADVICE r4: an empty/whitespace-only or single-token document
    used to hand F.slice a negative length and crash the Spark side
    while the oracle's len(t) >= 2 guard sailed on. Engine symmetry on
    the adversarial corpus is the gate, not just absence-of-crash."""
    import pandas as pd

    base = ["alpha beta gamma"] * 6 + ["beta gamma delta"] * 5
    texts = base + ["", "   ", "solo", "\t\n"]
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "t",
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    got = sorted(
        tuple(r)
        for r in entrymod.queries()["collocations_lift"](
            spark, str(tmp_path)
        ).collect()
    )
    want = _oracle_rows(
        entrymod.oracle_sql()["collocations_lift"], tmp_path, ["documents"]
    )
    assert got == want
    assert len(got) > 0


def test_ewma_nulls_symmetric_with_oracle(spark, tmp_path):
    """ADVICE r4: NULL event values made Spark (collect_list drops
    NULLs) and DuckDB (list_reduce poisons the fold to NULL) disagree;
    an all-NULL user crashed the slice. The explicit IS NOT NULL
    contract must make both engines agree: NULL-bearing users fold
    over their non-NULL values only, all-NULL users are absent."""
    import datetime

    import pandas as pd

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(8):  # user 1: some NULLs interleaved
        rows.append((i, t0 + datetime.timedelta(hours=i), 1, "click",
                     None if i % 3 == 1 else float(i + 1), "{}"))
    for i in range(3):  # user 2: ALL NULL values
        rows.append((100 + i, t0 + datetime.timedelta(hours=i), 2, "view",
                     None, "{}"))
    rows.append((200, t0, 3, "buy", 7.5, "{}"))  # user 3: single value
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")
    got = sorted(
        tuple(r)
        for r in entrymod.queries()["ewma_user_value"](
            spark, str(tmp_path)
        ).collect()
    )
    want = _oracle_rows(
        entrymod.oracle_sql()["ewma_user_value"], tmp_path, ["events"]
    )
    assert got == want
    users = {r[0] for r in got}
    assert users == {1, 3}  # all-NULL user 2 absent from BOTH engines


def test_kmeans_seeds_from_smallest_observed_ids(spark):
    """ADVICE r4: seeding with filter(id < k) silently fits fewer than
    k clusters on sparse/offset id domains. Seeding from the k
    smallest OBSERVED ids must produce exactly k centroids even when
    no id is < k."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.kmeans import (
        kmeans_fit,
    )

    rows = [
        (1000 + 10 * i, [float(i % 3), float(i % 5), 1.0]) for i in range(12)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    cents, assigned = kmeans_fit(emb, k=4, iterations=2)
    assert len(cents) == 4
    assert sorted(cents) == [1000, 1010, 1020, 1030]  # smallest observed
    assert assigned.filter(F.col("cluster").isNull()).count() == 0


def test_cap_rows_per_key_bounds_hot_key_and_keeps_cold_keys(spark):
    """VERDICT r4 #5: the fold queries' collect_list buffer must be
    bounded — a hot key keeps exactly `cap` rows (latest or first per
    `keep`), under-cap keys are returned byte-identical."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.bounded import (
        cap_rows_per_key,
    )

    rows = [(1, i, float(i)) for i in range(50)]  # hot key: 50 rows
    rows += [(2, i, float(100 + i)) for i in range(3)]  # cold key
    df = spark.createDataFrame(rows, "k long, o long, v double")

    last = cap_rows_per_key(df, ["k"], ["o"], cap=8, keep="last")
    got_hot = sorted(r.o for r in last.filter("k = 1").collect())
    assert got_hot == list(range(42, 50))  # the LATEST 8
    got_cold = sorted((r.o, r.v) for r in last.filter("k = 2").collect())
    assert got_cold == [(0, 100.0), (1, 101.0), (2, 102.0)]  # unchanged

    first = cap_rows_per_key(df, ["k"], ["o"], cap=8, keep="first")
    assert sorted(r.o for r in first.filter("k = 1").collect()) == list(
        range(8)
    )


def test_fold_queries_bounded_under_monkeypatched_cap(spark, tmp_path,
                                                      monkeypatch):
    """End-to-end: with the cap forced tiny, ewma folds only each
    user's LATEST cap values and top_session_paths only each day's
    FIRST cap events — and with the default cap, results on the same
    data are identical to the uncapped formulation."""
    import datetime

    import pandas as pd

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators import (
        bounded,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 1, "e" + str(i % 3),
         float(i), "{}")
        for i in range(10)
    ]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")

    full_ewma = entrymod.queries()["ewma_user_value"](
        spark, str(tmp_path)
    ).collect()

    monkeypatch.setattr(bounded, "MAX_SEQ_PER_KEY", 4)
    capped_ewma = entrymod.queries()["ewma_user_value"](
        spark, str(tmp_path)
    ).collect()
    # EWMA over the latest 4 values (6,7,8,9): ((6/2+7/2)/2+8/2)/2+9/2
    s = 6.0
    for x in (7.0, 8.0, 9.0):
        s = s / 2 + x / 2
    assert capped_ewma[0].ewma == round(s, 6)
    assert full_ewma[0].ewma != capped_ewma[0].ewma  # cap really bit

    capped_paths = entrymod.queries()["top_session_paths"](
        spark, str(tmp_path)
    ).collect()
    # first 4 events of the day: e0>e1>e2>e0
    assert capped_paths[0].path == "e0>e1>e2>e0"
    assert capped_paths[0].n_sessions == 1
