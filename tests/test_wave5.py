"""Round-3 wave: order stats, anomaly flags, search, quantization,
degree stats, resize, streaming hourly.

Correctness vs DuckDB is oracled (tools/verify_oracle.py, driver
gate); tests here pin the semantics on hand-built micro-fixtures."""

from __future__ import annotations

import numpy as np

from dataset_batch_processor_spark.operators import quantize, relational5
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
        for r in _run_sql(spark, relational5.MEDIAN_SPARK, orders=orders).collect()
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
    row = _run_sql(spark, relational5.MODE_SPARK, lineitem=li).collect()[0]
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
    out = _run_sql(spark, relational5.ANOMALY_SPARK, events=ev).collect()
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
