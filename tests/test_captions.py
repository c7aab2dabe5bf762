"""Caption join (J1), MRU ordering (A5), and upsert (K10) semantics."""

from __future__ import annotations

from pyspark.sql import Row

from dataset_batch_processor_spark.operators import captions as cap_ops


def test_left_join_null_tolerant(spark):
    images = spark.createDataFrame(
        [
            Row(image_id=k, basename=f"img_{k}", ext="png", width=10, height=10)
            for k in range(4)
        ]
    )
    caps = spark.createDataFrame(
        [Row(basename="img_1", caption="c1"), Row(basename="img_3", caption="c3")]
    )
    got = {r.basename: r.caption for r in cap_ops.join_captions(images, caps).collect()}
    assert got == {"img_0": None, "img_1": "c1", "img_2": None, "img_3": "c3"}


def test_mru_rank(spark):
    d = spark.createDataFrame(
        [
            Row(caption="old", last_used_seq=1),
            Row(caption="newest", last_used_seq=9),
            Row(caption="  ", last_used_seq=5),  # blank dropped (F6)
            Row(caption="mid", last_used_seq=4),
        ]
    )
    rows = cap_ops.mru_captions(d).collect()
    assert [(r.caption, r.mru_rank) for r in sorted(rows, key=lambda r: r.mru_rank)] == [
        ("newest", 1),
        ("mid", 2),
        ("old", 3),
    ]


def test_upsert_move_to_front(spark):
    d = spark.createDataFrame(
        [Row(caption="a", last_used_seq=1), Row(caption="b", last_used_seq=2)]
    )
    got = {
        r.caption: r.last_used_seq
        for r in cap_ops.upsert_caption(d, "a", 99).collect()
    }
    assert got == {"a": 99, "b": 2}  # 'a' moved to front (max recency)


def test_upsert_empty_is_noop(spark):
    d = spark.createDataFrame([Row(caption="a", last_used_seq=1)])
    got = cap_ops.upsert_caption(d, "   ", 99)
    assert {r.caption: r.last_used_seq for r in got.collect()} == {"a": 1}
