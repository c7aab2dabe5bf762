"""Tiling geometry: differential tests vs plain-Python re-implementations
of the reference formulas (SURVEY.md §5.2 items 3-4) + property-based
invariants."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from dataset_batch_processor_spark.operators import tiling


def ref_step(tile, overlap):
    # /root/reference/modules/tiling.py:28 (re-derived, not copied)
    return tile - int(overlap * tile)


def ref_grid(w, h, tile, overlap, padding):
    """Plain-Python oracle for the reference tile loop
    (tiling.py:29-41): returns list of (i, j, box)."""
    step = ref_step(tile, overlap)
    h_tiles = max(0, (w - padding) // step)
    v_tiles = max(0, (h - padding) // step)
    out = []
    for j in range(v_tiles):
        for i in range(h_tiles):
            left, upper = i * step, j * step
            out.append(
                (i, j, (left, upper, min(left + tile, w), min(upper + tile, h)))
            )
    return out


def make_images(spark, dims):
    rows = [
        Row(image_id=k, basename=f"img_{k}", ext="png", width=w, height=h)
        for k, (w, h) in enumerate(dims)
    ]
    return spark.createDataFrame(rows)


def test_grid_matches_python_oracle(spark):
    dims = [(512, 512), (1024, 1024), (1536, 2048), (4095, 513), (100, 100)]
    spec = tiling.TileSpec(tile_size=1024, overlap_ratio=0.5, padding=10)
    got = {
        (r.image_id, r.i, r.j): (r.box_left, r.box_top, r.box_right, r.box_bottom)
        for r in tiling.tile_grid(make_images(spark, dims), spec).collect()
    }
    expected = {}
    for k, (w, h) in enumerate(dims):
        for i, j, box in ref_grid(w, h, 1024, 0.5, 10):
            expected[(k, i, j)] = box
    assert got == expected


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(64, 4096),
    h=st.integers(64, 4096),
    tile=st.sampled_from([256, 512, 1024]),
    overlap=st.sampled_from([0.0, 0.25, 0.5, 0.9]),
    padding=st.sampled_from([0, 10]),
)
def test_grid_properties(spark_global, w, h, tile, overlap, padding):
    spark = spark_global
    spec = tiling.TileSpec(tile_size=tile, overlap_ratio=overlap, padding=padding)
    rows = tiling.tile_grid(make_images(spark, [(w, h)]), spec).collect()
    step = ref_step(tile, overlap)
    h_tiles = max(0, (w - padding) // step)
    v_tiles = max(0, (h - padding) // step)
    assert len(rows) == h_tiles * v_tiles
    for r in rows:
        # every box within image bounds
        assert 0 <= r.box_left < r.box_right <= w
        assert 0 <= r.box_top < r.box_bottom <= h
        assert r.tile_w == r.box_right - r.box_left
        assert r.tile_h == r.box_bottom - r.box_top


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


def test_overlap_one_rejected():
    # SURVEY.md §2.9.5: the reference ZeroDivisionErrors; we reject.
    with pytest.raises(ValueError):
        tiling.TileSpec(tile_size=1024, overlap_ratio=1.0)


def test_auto_adjust_full_tiles(spark):
    """Auto Adjust (G4): every emitted box is exactly tile-sized when
    the image is at least tile-sized (tiling.py:43-49 semantics)."""
    spec = tiling.TileSpec(
        tile_size=512, overlap_ratio=0.5, padding=0, pad_option="Auto Adjust"
    )
    rows = tiling.tile_grid(make_images(spark, [(1300, 700)]), spec).collect()
    assert rows
    for r in rows:
        assert r.tile_w == 512 and r.tile_h == 512
        assert 0 <= r.box_left and r.box_right <= 1300
        assert 0 <= r.box_top and r.box_bottom <= 700


def test_num_tiles_derivation(spark):
    """P6: tile_size = min(w,h) // int(sqrt(num_tiles)) (tiling.py:25-26)."""
    spec = tiling.TileSpec(tile_size=0, overlap_ratio=0.0, num_tiles=9)
    rows = tiling.tile_grid(make_images(spark, [(900, 600)]), spec).collect()
    derived = 600 // int(math.isqrt(9))
    grid = ref_grid(900, 600, derived, 0.0, 0)
    assert len(rows) == len(grid)


def test_tile_filename_format(spark):
    spec = tiling.TileSpec(tile_size=512, overlap_ratio=0.0, save_format="JPG")
    rows = tiling.tile_grid(make_images(spark, [(1024, 512)]), spec).collect()
    names = {r.tile_name for r in rows}
    assert names == {"img_0_tile_0_0.jpg", "img_0_tile_1_0.jpg"}
