"""Round-3 wave: order stats, anomaly flags, search, quantization,
degree stats, resize, streaming hourly.

Correctness vs DuckDB is oracled (tools/verify_oracle.py, driver
gate); tests here pin the semantics on hand-built micro-fixtures."""

from __future__ import annotations

import numpy as np

from dataset_batch_processor_spark.operators import events as events_ops, quantize, windows
from dataset_batch_processor_spark.multimodal import binary, png


def _run_sql(spark, sql, **views):
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return spark.sql(sql)


def test_median_interpolates(spark):
    orders = spark.createDataFrame(
        [("A", 10.0), ("A", 20.0), ("A", 21.0), ("A", 40.0), ("B", 5.0)],
        "o_orderpriority string, o_totalprice double",
    )
    out = {
        r.o_orderpriority: (r.median_price, r.p90_price)
        for r in _run_sql(spark, windows.MEDIAN_SPARK, orders=orders).collect()
    }
    # A: 4 values, median at pos 1.5 -> 20 + 0.5*(21-20) = 20.5;
    # p90 at pos 2.7 -> 21 + 0.7*(40-21) = 34.3
    assert out["A"] == (20.5, 34.3)
    assert out["B"] == (5.0, 5.0)


def test_mode_breaks_ties_to_smallest_qty(spark):
    li = spark.createDataFrame(
        [("R", 3.0), ("R", 3.0), ("R", 7.0), ("R", 7.0), ("R", 5.0)],
        "l_returnflag string, l_quantity double",
    )
    row = _run_sql(spark, windows.MODE_SPARK, lineitem=li).collect()[0]
    assert (row.mode_qty, row.n_occurrences) == (3, 2)  # tie 3 vs 7 -> 3


def test_anomaly_flags_only_outlier_hours(spark):
    import datetime

    rows = []
    # 10 calm hours of 5 events, one hour with 50 -> only that flags
    for h in range(10):
        for i in range(5):
            rows.append(("click", datetime.datetime(2024, 1, 1, h, i)))
    for i in range(50):
        rows.append(("click", datetime.datetime(2024, 1, 1, 12, i % 60)))
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = _run_sql(spark, events_ops.ANOMALY_SPARK, events=ev).collect()
    flagged = [r.hour for r in out if r.is_anomaly]
    assert flagged == ["2024-01-01 12:00:00"]
    assert len(out) == 11


def test_quantize_codes_span_full_range(spark):
    emb = spark.createDataFrame(
        [(1, [0.0, 10.0]), (2, [1.0, 20.0]), (3, [2.0, 15.0])],
        "vec_id long, embedding array<float>",
    )
    codes = {
        (r.vec_id, r.pos): r.code
        for r in quantize.quantize_codes(emb).collect()
    }
    # dim0 spans [0,2]: 0 -> 0, 1 -> 127 (floor 127.5), 2 -> 255
    assert codes[(1, 0)] == 0 and codes[(2, 0)] == 127 and codes[(3, 0)] == 255
    # dim1 spans [10,20]: 15 -> floor(127.5) = 127
    assert codes[(1, 1)] == 0 and codes[(2, 1)] == 255 and codes[(3, 1)] == 127


def test_quantize_constant_dim_is_zero(spark):
    emb = spark.createDataFrame(
        [(1, [4.0]), (2, [4.0])], "vec_id long, embedding array<float>"
    )
    assert {r.code for r in quantize.quantize_codes(emb).collect()} == {0}


def test_resize_nearest_matches_oracle_index_math():
    # the closed-form oracle assumes src = out_idx * in_dim // out_dim
    d = 37
    w, h = d % 16 + 4, d % 13 + 4
    y, x, c = np.mgrid[0:h, 0:w, 0:3]
    arr = ((d + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)
    small = binary.resize_nearest(arr, 8, 8)
    for yy in range(8):
        for xx in range(8):
            for cc in range(3):
                expect = (d + 3 * (xx * w // 8) + 7 * (yy * h // 8) + 11 * cc) % 256
                assert small[yy, xx, cc] == expect
    # and the PNG re-encode of the thumbnail is lossless
    assert np.array_equal(
        binary.decode_any("png", png.encode_png(small)), small
    )


def test_keep_longest_prefers_longest_then_smallest_id(spark):
    from dataset_batch_processor_spark.operators import components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (10, 4), (11, 4)],
        "doc_id bigint, n_chars bigint",
    )
    labels = components.connected_components(edges, src="doc_a", dst="doc_b")
    members = labels.join(
        docs.withColumnRenamed("doc_id", "node"), "node"
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("comp").orderBy(F.desc("n_chars"), F.asc("node"))
    keep = {
        r.comp: r.node
        for r in members.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    # cluster {1,2,3}: 2 and 3 tie at 9 chars -> keep 2 (smaller id)
    # cluster {10,11}: tie at 4 -> keep 10
    assert keep == {1: 2, 10: 10}


def test_label_knn_stays_inside_label_block(spark):
    from dataset_batch_processor_spark.operators import similarity

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 1),     # query (vec_id % 50 == 0), label 1
            (1, [1.0, 0.1], 1),     # near, same label
            (2, [0.9, 0.0], 1),     # same label
            (3, [1.0, 0.0], 2),     # IDENTICAL direction but other label
            (50, [0.0, 1.0], 2),    # query, label 2
            (4, [0.1, 1.0], 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = similarity.label_blocked_knn(emb, k=2)
    rows = {(r.query_id, r.neighbor_id) for r in out.collect()}
    assert (0, 3) not in rows          # cross-label never returned
    assert (0, 1) in rows and (0, 2) in rows
    assert (50, 4) in rows and (50, 3) in rows


def test_sliding_window_spans_three_hours(spark):
    import datetime

    ev = spark.createDataFrame(
        [(7, "click", datetime.datetime(2024, 1, 1, 5, 30))],
        "user_id bigint, event_type string, ts timestamp",
    )
    out = _run_sql(spark, events_ops.SLIDING_SPARK, events=ev).collect()
    # one event -> exactly the 3 windows whose 3h span covers 05:30
    assert [r.window_start for r in out] == [
        "2024-01-01 03:00:00",
        "2024-01-01 04:00:00",
        "2024-01-01 05:00:00",
    ]
    assert all(r.n_users == 1 and r.n_events == 1 for r in out)


def test_mixture_ppm_sums_to_million(spark):
    from dataset_batch_processor_spark.operators import corpusstats

    docs = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "d e", "s1"), (3, "f g h i j", "s2")],
        "doc_id bigint, text string, source string",
    )
    out = {
        r.source: (r.n_docs, r.n_tokens, r.token_ppm)
        for r in _run_sql(
            spark, corpusstats.MIXTURE_SPARK, documents=docs
        ).collect()
    }
    assert out["s1"] == (2, 5, 500000)  # 5 of 10 tokens
    assert out["s2"] == (1, 5, 500000)


def test_surprisal_ranks_common_tokens_low(spark):
    from dataset_batch_processor_spark.operators import corpusstats

    # 'the' x4 -> rank 1; 'rare' x1 -> highest rank
    docs = spark.createDataFrame(
        [(1, "the the the the", None, None), (2, "rare the zz", None, None)],
        "doc_id bigint, text string, lang string, source string",
    )
    docs.createOrReplaceTempView("documents")
    out = {
        r.doc_id: (r.n_tokens, r.rank_sum)
        for r in corpusstats.surprisal_rank_df(spark).collect()
    }
    # vocab by (count desc, token asc): the(4)->1, rare(1)->2, zz(1)->3
    assert out[1] == (4, 4)          # 4 x rank 1
    assert out[2] == (3, 1 + 2 + 3)  # the + rare + zz


def test_cdc_chunk_count_is_boundaries_plus_one(spark):
    from dataset_batch_processor_spark.operators import textanalysis

    docs = spark.createDataFrame(
        [(1, "abcdefghij klmnop qrstuv wxyz abcdefghij")],
        "doc_id bigint, text string",
    )
    row = _run_sql(spark, textanalysis.CDC_SPARK, documents=docs).collect()[0]
    assert row.n_chunks == row.n_boundaries + 1
    assert row.n_chars == 40


def test_bloom_decontam_catches_planted_contamination(spark):
    from dataset_batch_processor_spark.operators import decontam

    shared = "w1 w2 w3 w4 w5 w6 w7 w8"  # exactly one 8-gram
    docs = spark.createDataFrame(
        [
            (0, shared + " tail1"),                 # eval (0 % 23 == 0)
            (1, "pre " + shared),                   # train, contaminated
            (2, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),      # train, clean
        ],
        "doc_id bigint, text string",
    )
    out = _run_sql(spark, decontam.BLOOM_SPARK, documents=docs).collect()
    assert len(out) == 1
    r = out[0]
    assert r.doc_id == 1 and r.n_bloom_grams >= 1
    assert r.n_exact_grams >= 1


def test_asof_snapshot_picks_active_regime(spark):
    import datetime

    from dataset_batch_processor_spark.operators import analytics

    TS = datetime.datetime
    orders = spark.createDataFrame(
        [
            (1, 10, "2-HIGH", TS(1996, 1, 1)),
            (1, 11, "5-LOW", TS(1997, 3, 1)),    # active at 1997-06-01
            (1, 12, "2-HIGH", TS(1998, 1, 1)),
            (2, 20, "1-URGENT", TS(1998, 2, 2)),  # starts after snapshot
        ],
        "o_custkey bigint, o_orderkey bigint, o_orderpriority string, "
        "o_orderdate timestamp",
    )
    out = _run_sql(spark, analytics.SNAPSHOT_SPARK, orders=orders).collect()
    assert [(r.o_custkey, r.priority, r.version) for r in out] == [
        (1, "5-LOW", 2)
    ]


def test_first_last_order_encoding_breaks_date_ties_by_key(spark):
    import datetime

    TS = datetime.datetime
    orders = spark.createDataFrame(
        [
            (1, 5, TS(1995, 1, 1)),
            (1, 3, TS(1995, 1, 1)),   # same date, smaller key -> first
            (1, 9, TS(1996, 1, 1)),
        ],
        "o_custkey bigint, o_orderkey bigint, o_orderdate timestamp",
    )
    row = _run_sql(spark, windows.FIRST_LAST_SPARK, orders=orders).collect()[0]
    assert (row.first_orderkey, row.last_orderkey, row.n_orders) == (3, 9, 3)


def test_pagerank_hub_outranks_leaves(spark):
    from dataset_batch_processor_spark.operators import components

    # star: 1 is the hub of 2..5; 10-11 an isolated pair
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (10, 11)],
        "doc_a bigint, doc_b bigint",
    )
    pr = {r.node: r.pagerank for r in components.pagerank_lite(pairs).collect()}
    assert pr[1] > pr[2] == pr[3] == pr[4] == pr[5]
    assert pr[10] == pr[11]
    # total mass stays bounded by n * SCALE (damping keeps it finite)
    assert sum(pr.values()) <= 7 * components.PR_SCALE
