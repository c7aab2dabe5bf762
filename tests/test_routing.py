"""Routing (F2-F4) + crop math (P2/P3) vs plain-Python reference formulas."""

from __future__ import annotations

from pyspark.sql import Row

from dataset_batch_processor_spark.operators import routing


def make_images(spark, dims):
    return spark.createDataFrame(
        [
            Row(image_id=k, basename=f"img_{k}", ext="png", width=w, height=h)
            for k, (w, h) in enumerate(dims)
        ]
    )


def ref_recommended(w, h, tile, step):
    # /root/reference/modules/filter_crop.py:6-13 (re-derived)
    if w < tile or h < tile:
        return w, h
    new_w = min(((w - tile) // step) * step + tile, w)
    new_h = min(((h - tile) // step) * step + tile, h)
    return new_w, new_h


def test_routing_and_recommendation(spark):
    dims = [(1024, 1024), (1536, 1536), (1000, 2048), (4095, 3000), (512, 512)]
    tile, step = 1024, 512
    rows = routing.route_images(make_images(spark, dims), 1024, 0.5).collect()
    assert len(rows) == len(dims)
    for r in rows:
        w, h = dims[r.image_id]
        too_small = w < tile or h < tile
        untileable = ((w - tile) % step != 0) or ((h - tile) % step != 0)
        expected_route = "incompatible" if (too_small or untileable) else "ok"
        assert r.route == expected_route, (w, h)
        assert (r.rec_w, r.rec_h) == ref_recommended(w, h, tile, step)


def test_auto_crop_center_box(spark):
    dims = [(1000, 2048)]  # incompatible: 1000 < 1024
    rows = routing.auto_crop(
        routing.route_images(make_images(spark, dims), 1024, 0.5)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    # too-small dims pass through (P2), so crop == full frame here
    assert (r.new_w, r.new_h) == (1000, 2048)
    assert (r.crop_left, r.crop_top, r.crop_right, r.crop_bottom) == (
        0,
        0,
        1000,
        2048,
    )


def test_compatible_images_not_cropped(spark):
    rows = routing.auto_crop(
        routing.route_images(make_images(spark, [(1024, 1024)]), 1024, 0.5)
    ).collect()
    assert rows == []
