"""Lossless JPEG (T.81 SOF3) codec: spec-structure, roundtrip,
boundary-category, fuzz, and DNG container tests."""

from __future__ import annotations

import numpy as np
import pytest

from dataset_batch_processor_spark.multimodal import ljpeg, tiff


def _rng():
    return np.random.default_rng(42)


def test_stream_structure_markers():
    arr = np.arange(12, dtype=np.uint16).reshape(3, 4)
    data = ljpeg.encode_ljpeg(arr, precision=4)
    assert data[:2] == b"\xff\xd8"  # SOI
    assert data[-2:] == b"\xff\xd9"  # EOI
    assert b"\xff\xc3" in data  # SOF3 (lossless)
    assert b"\xff\xc4" in data  # DHT
    assert b"\xff\xda" in data  # SOS


def test_roundtrip_all_predictors_and_precisions():
    rng = _rng()
    for pred in range(1, 8):
        for prec in (2, 8, 12, 16):
            arr = rng.integers(0, 1 << prec, size=(9, 7)).astype(np.uint16)
            dec = ljpeg.decode_ljpeg(
                ljpeg.encode_ljpeg(arr, precision=prec, predictor=pred)
            )
            assert np.array_equal(dec[:, :, 0], arr), (pred, prec)


def test_roundtrip_multi_component_interleaved():
    rng = _rng()
    for nc in (2, 3, 4):
        arr = rng.integers(0, 65536, size=(6, 5, nc)).astype(np.uint16)
        dec = ljpeg.decode_ljpeg(ljpeg.encode_ljpeg(arr, precision=16))
        assert dec.shape == (6, 5, nc)
        assert np.array_equal(dec, arr)


def test_extreme_diffs_hit_ssss16():
    """Alternating 0/65535 forces the +-32768 wrap and the SSSS=16
    no-extra-bits special case (T.81 H.1.2.2)."""
    arr = np.zeros((4, 4), dtype=np.uint16)
    arr[::2, ::2] = 65535
    arr[1::2, 1::2] = 65535
    dec = ljpeg.decode_ljpeg(ljpeg.encode_ljpeg(arr, precision=16))
    assert np.array_equal(dec[:, :, 0], arr)


def test_single_pixel_and_single_row_and_column():
    for shape in ((1, 1), (1, 9), (9, 1)):
        arr = _rng().integers(0, 65536, size=shape).astype(np.uint16)
        dec = ljpeg.decode_ljpeg(ljpeg.encode_ljpeg(arr, precision=16))
        assert np.array_equal(dec[:, :, 0], arr)


def test_byte_stuffing_survives():
    """A constant image of a value whose codes emit 0xFF runs must
    still roundtrip (stuffed 0xFF00 unstuffed on decode)."""
    arr = np.full((16, 16), 40000, dtype=np.uint16)
    data = ljpeg.encode_ljpeg(arr, precision=16, predictor=1)
    dec = ljpeg.decode_ljpeg(data)
    assert np.array_equal(dec[:, :, 0], arr)


def test_smooth_data_compresses():
    y, x = np.mgrid[0:64, 0:64]
    arr = ((x * 97 + y * 131) % 60000).astype(np.uint16)
    data = ljpeg.encode_ljpeg(arr, precision=16, predictor=4)
    assert len(data) < arr.nbytes // 3


def test_truncation_raises_or_degrades_not_hangs():
    """Any truncation must terminate: either a clean parse error or a
    degraded-but-complete decode (the 1-bit padding convention), never
    a hang or a non-Exception crash."""
    import struct as _struct

    arr = _rng().integers(0, 65536, size=(8, 8)).astype(np.uint16)
    data = ljpeg.encode_ljpeg(arr, precision=16)
    for cut in (10, len(data) // 2, len(data) - 3):
        try:
            out = ljpeg.decode_ljpeg(data[:cut])
            assert out.shape == (8, 8, 1)  # degraded decode completed
        except (ValueError, NotImplementedError, KeyError, IndexError,
                _struct.error):
            pass


def test_lossy_stream_rejected_with_reason():
    from dataset_batch_processor_spark.multimodal import jpeg as lossy

    y, x, c = np.mgrid[0:16, 0:16, 0:3]
    rgb = ((x * 5 + y * 3 + c) % 256).astype(np.uint8)
    stream = lossy.encode_jpeg(rgb)
    with pytest.raises(NotImplementedError, match="SOF3"):
        ljpeg.decode_ljpeg(stream)


def test_dng_container_roundtrip_multistrip_rejected_cleanly():
    rng = _rng()
    arr = rng.integers(0, 65536, size=(12, 10, 2)).astype(np.uint16)
    dng = tiff.encode_dng_lossless(arr, predictor=5)
    assert np.array_equal(tiff.decode_dng_lossless(dng), arr)
    # header probe works without decode
    assert tiff.probe_tiff_dims(dng) == (10, 12)
    # non-lossless compression quarantines with a precise reason
    plain = tiff.encode_tiff(
        rng.integers(0, 256, size=(5, 5, 3)).astype(np.uint8)
    )
    with pytest.raises(NotImplementedError, match="not lossless"):
        tiff.decode_dng_lossless(plain)


def test_registry_display_path():
    from dataset_batch_processor_spark.multimodal import binary

    arr = (_rng().integers(0, 65536, size=(7, 9)).astype(np.uint16))
    dng = tiff.encode_dng_lossless(arr)
    disp = binary.CODECS["dng"](dng)
    assert disp.shape == (7, 9, 3) and disp.dtype == np.uint8
    assert np.array_equal(disp[:, :, 0], (arr >> 8).astype(np.uint8))


def test_restart_interval_roundtrip_row_aligned():
    """Row-aligned DRI streams decode bit-exactly, with prediction
    resetting per interval (T.81 H.1.1)."""
    rng = _rng()
    for h, w, nc in [(8, 5, 1), (16, 7, 2), (9, 4, 3)]:
        arr = rng.integers(0, 65536, size=(h, w, nc)).astype(np.uint16)
        for rr in (1, 2, 3, 8):
            data = ljpeg.encode_ljpeg(
                arr, precision=16, predictor=4, restart_rows=rr
            )
            assert np.array_equal(ljpeg.decode_ljpeg(data), arr), (h, w, rr)
    # DRI segment present with the row-aligned interval
    data = ljpeg.encode_ljpeg(
        np.zeros((6, 4), np.uint16), restart_rows=2
    )
    i = data.index(b"\xff\xdd")
    import struct as _s

    assert _s.unpack(">H", data[i + 4 : i + 6])[0] == 2 * 4


def test_restart_interval_non_row_aligned_quarantines():
    arr = np.zeros((4, 4), dtype=np.uint16)
    data = bytearray(ljpeg.encode_ljpeg(arr, precision=16, restart_rows=2))
    import struct as _s

    i = data.index(b"\xff\xdd")
    data[i + 4 : i + 6] = _s.pack(">H", 7)  # Ri=7, width=4
    with pytest.raises(NotImplementedError, match="not row-aligned"):
        ljpeg.decode_ljpeg(bytes(data))


def test_restart_marker_sequence_checked():
    arr = _rng().integers(0, 65536, size=(6, 3, 1)).astype(np.uint16)
    data = bytearray(
        ljpeg.encode_ljpeg(arr, precision=16, restart_rows=2)
    )
    # corrupt the first RSTn (0xD0 -> 0xD5): sequence check must fire
    for j in range(len(data) - 1):
        if data[j] == 0xFF and data[j + 1] == 0xD0:
            data[j + 1] = 0xD5
            break
    with pytest.raises(ValueError, match="out of sequence"):
        ljpeg.decode_ljpeg(bytes(data))


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        nc=st.integers(1, 4),
        prec=st.integers(2, 16),
        pred=st.integers(1, 7),
        seed=st.integers(0, 2**31),
    )
    def test_property_roundtrip_exact(h, w, nc, prec, pred, seed):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 1 << prec, size=(h, w, nc)).astype(np.uint16)
        dec = ljpeg.decode_ljpeg(
            ljpeg.encode_ljpeg(arr, precision=prec, predictor=pred)
        )
        assert np.array_equal(dec, arr)
except ImportError:  # pragma: no cover
    pass


def test_exif_orientation_transforms():
    """Spec properties of the 8-case transform: 1 is identity; 2,3,4
    are involutions; 6 and 8 are mutual inverses; 5 and 7 are
    involutions; 5-8 swap dims; every case is a bijection (same
    multiset of pixels)."""
    rng = _rng()
    a = rng.integers(0, 65536, size=(5, 8)).astype(np.uint16)
    t = tiff.apply_exif_orientation
    assert np.array_equal(t(a, 1), a)
    for o in (2, 3, 4, 5, 7):
        assert np.array_equal(t(t(a, o), o), a), o
    assert np.array_equal(t(t(a, 6), 8), a)
    assert np.array_equal(t(t(a, 8), 6), a)
    for o in (5, 6, 7, 8):
        assert t(a, o).shape == (8, 5), o
    for o in range(1, 9):
        assert sorted(t(a, o).ravel()) == sorted(a.ravel())
    # rot90 CW moves the top-left corner to the top-right
    assert t(a, 6)[0, -1] == a[0, 0]


def test_orientation_tag_probe_roundtrip():
    arr = _rng().integers(0, 65536, size=(4, 6)).astype(np.uint16)
    for o in range(1, 9):
        dng = tiff.encode_dng_lossless(arr, orientation=o)
        assert tiff.probe_tiff_orientation(dng) == o
        # pixel payload is orientation-independent (tag only)
        assert np.array_equal(tiff.decode_dng_lossless(dng)[:, :, 0], arr)


# ------------------------------------------------------- tiled DNG


def test_dng_tiled_roundtrip_geometries():
    """Tiled layout (TIFF 6.0 §15): bit-exact across image-smaller-
    than-tile, exact-multiple, and clipped-edge geometries, 1-3
    components, multiple predictors."""
    rng = _rng()
    for h, w, nc in [(10, 10, 1), (16, 16, 3), (20, 35, 2), (33, 17, 1),
                     (48, 48, 3)]:
        arr = rng.integers(0, 65536, size=(h, w, nc)).astype(np.uint16)
        for tile in [(16, 16), (32, 16)]:
            dng = tiff.encode_dng_lossless(arr, predictor=4, tile=tile)
            assert np.array_equal(tiff.decode_dng_lossless(dng), arr), (
                h, w, nc, tile,
            )
            # header probe ignores layout
            assert tiff.probe_tiff_dims(dng) == (w, h)


def test_dng_tiled_container_tags():
    """The container carries the full tile tag set with row-major
    full-size tiles; a tile-geometry lie is detected."""
    arr = _rng().integers(0, 65536, size=(20, 40, 1)).astype(np.uint16)
    dng = tiff.encode_dng_lossless(arr, tile=(16, 16))
    bo = tiff._parse_header(dng)
    tags = tiff._read_ifd(dng, bo)
    assert int(tags[322][0]) == 16 and int(tags[323][0]) == 16
    assert len(tags[324]) == 3 * 2 and len(tags[325]) == 3 * 2
    # corrupt TileWidth -> tile count mismatch, not silent garbage
    import struct as _struct

    idx = dng.index(_struct.pack("<HHI", 322, 4, 1))
    bad = bytearray(dng)
    bad[idx + 8 : idx + 12] = _struct.pack("<I", 48)
    with pytest.raises(ValueError, match="tile count mismatch"):
        tiff.decode_dng_lossless(bytes(bad))


def test_dng_tile_dims_must_be_multiple_of_16():
    arr = np.zeros((8, 8), dtype=np.uint16)
    with pytest.raises(ValueError, match="multiples of 16"):
        tiff.encode_dng_lossless(arr, tile=(10, 16))
    with pytest.raises(ValueError, match="multiples of 16"):
        tiff.encode_dng_lossless(arr, tile=(16, 0))
