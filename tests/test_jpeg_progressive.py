"""Progressive JPEG (SOF2) codec tests.

The reference decodes progressive JPEGs for free through PIL
(/root/reference/modules/other_tasks.py:53); here the pure-Python
decoder implements T.81 Annex G scan assembly and the progressive
encoder provides self-produced fixtures. Strongest check: the
progressive and baseline encoders quantize identically, so decoding
either stream of the same source must give bit-identical pixels.
"""

from __future__ import annotations

import numpy as np
import pytest

from dataset_batch_processor_spark.multimodal import binary, jpeg


def _gradient(h, w, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [x * 3 + seed % 100, y * 4 + seed % 80, x + y + seed % 50], axis=2
    ).astype(np.uint8)


def test_progressive_is_sof2():
    data = jpeg.encode_jpeg_progressive(_gradient(16, 16))
    assert b"\xff\xc2" in data  # SOF2 marker
    assert data.count(b"\xff\xda") == len(jpeg.PROG_SCRIPT)  # one SOS per scan


@pytest.mark.parametrize("h,w,seed", [(16, 16, 0), (24, 17, 5), (3, 5, 9),
                                      (8, 8, 3), (40, 33, 7)])
def test_progressive_matches_baseline_decode(h, w, seed):
    """Same quant pipeline -> the two streams must decode identically."""
    arr = _gradient(h, w, seed)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=85))
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(arr, quality=85))
    assert np.array_equal(base, prog)


def test_progressive_roundtrip_error_bound():
    arr = _gradient(32, 29, 11)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(arr, quality=85))
    assert dec.shape == arr.shape
    assert int(np.abs(dec.astype(int) - arr.astype(int)).max()) <= 8


def test_progressive_flat_image_long_eob_runs():
    """A flat image leaves every AC band empty -> the EOB-run path
    (symbols 0x10.., cross-block runs) carries the whole AC layer."""
    arr = np.full((64, 64, 3), 77, dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(arr, quality=85))
    assert int(np.abs(dec.astype(int) - arr.astype(int)).max()) <= 2


def test_progressive_noise_exercises_refinement():
    """Dense high-frequency content: every scan kind carries signal
    (AC first at Al=1 truncates magnitudes; the refinement scan must
    restore them exactly or the baseline-equality check fails)."""
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=85))
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(arr, quality=85))
    assert np.array_equal(base, prog)


def test_progressive_grayscale_promoted():
    g = np.tile(np.arange(16, dtype=np.uint8) * 8, (16, 1))
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(g))
    assert dec.shape == (16, 16, 3)


def test_progressive_through_registry_sniff():
    arr = _gradient(12, 20, 2)
    data = jpeg.encode_jpeg_progressive(arr)
    dec = binary.decode_any("xyz", data)  # sniffed as jpeg
    assert dec.shape == arr.shape


def test_lossless_frame_still_quarantined():
    # SOF3 (lossless) must keep raising into the F7 quarantine
    data = bytearray(jpeg.encode_jpeg(_gradient(8, 8)))
    idx = data.find(b"\xff\xc0")
    data[idx + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="unsupported frame"):
        jpeg.decode_jpeg(bytes(data))


def test_progressive_equals_baseline_property_hypothesis():
    """Property: for ANY uint8 RGB array, the progressive and
    baseline streams decode bit-identically (shared quant pipeline —
    the strongest invariant the two encoders admit)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=25, deadline=None)
    @given(
        arr=arrays(
            np.uint8,
            st.tuples(st.integers(1, 20), st.integers(1, 20), st.just(3)),
        ),
        quality=st.sampled_from([50, 85, 95]),
    )
    def check(arr, quality):
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=quality))
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(arr, quality=quality)
        )
        assert np.array_equal(base, prog)

    check()
