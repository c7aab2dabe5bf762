"""WebP VP8L codec: encoder-subset roundtrips, handcrafted streams
for the decode-only features (LZ77, color cache, palette), transform
inverses against the spec formulas, and container/error paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dataset_batch_processor_spark.multimodal import binary, webp
from dataset_batch_processor_spark.sources import images


def _rand(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


# ------------------------------------------------------- roundtrips


@pytest.mark.parametrize("h,w", [(1, 1), (2, 3), (7, 5), (16, 16), (11, 23)])
def test_roundtrip_random(h, w):
    arr = _rand(h, w, seed=h * 100 + w)
    assert np.array_equal(webp.decode_webp(webp.encode_webp(arr)), arr)


def test_roundtrip_subtract_green_and_edge_shapes():
    for shape in [(1, 100), (100, 1), (9, 9)]:
        arr = _rand(*shape, seed=shape[0])
        enc = webp.encode_webp(arr, subtract_green=True)
        assert np.array_equal(webp.decode_webp(enc), arr)


def test_roundtrip_degenerate_palettes():
    const = np.full((9, 9, 3), 77, dtype=np.uint8)
    assert np.array_equal(webp.decode_webp(webp.encode_webp(const)), const)
    two = np.tile(
        np.array([[[0, 0, 0], [255, 255, 255]]], dtype=np.uint8), (4, 3, 1)
    )
    assert np.array_equal(webp.decode_webp(webp.encode_webp(two)), two)


# ----------------------------------- handcrafted decode-only features


def _vp8l_container(bw_payload: bytes) -> bytes:
    stream = b"\x2f" + bw_payload
    chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _write_two_symbol_simple(bw, s0, s1):
    """simple prefix code with two 8-bit symbols."""
    bw.write(1, 1)  # simple
    bw.write(1, 1)  # two symbols
    bw.write(1, 1)  # first symbol is 8-bit
    bw.write(s0, 8)
    bw.write(s1, 8)


def _write_single_symbol(bw, s):
    bw.write(1, 1)
    bw.write(0, 1)
    if s < 2:
        bw.write(0, 1)
        bw.write(s, 1)
    else:
        bw.write(1, 1)
        bw.write(s, 8)


def test_lz77_backward_reference_and_distance_map():
    # 4x1 image: literal green=5 pixel, then LZ77 len=3 dist_code 1
    # (map entry (0,1)->dist clamped.. use code 2 => (1,0) dist=1):
    # copies the previous pixel 3 times.
    bw = webp._BitWriter()
    bw.write(3, 14)   # w-1
    bw.write(0, 14)   # h-1
    bw.write(0, 1)    # alpha hint
    bw.write(0, 3)    # version
    bw.write(0, 1)    # no transforms
    bw.write(0, 1)    # no color cache
    bw.write(0, 1)    # no meta prefix
    # green alphabet: symbol 5 (literal) and 256+2 (length code 2 -> 3)
    _write_two_symbol_simple_wide(bw, 5, 256 + 2)
    for ch in (10, 20, 30):  # r, b, a single-symbol codes
        _write_single_symbol(bw, ch)
    _write_single_symbol(bw, 1)  # distance code: prefix 1 -> code 2?? see below
    # data: literal pixel then the backref symbol
    bw.write(0, 1)    # green code 0 -> symbol 5 (literal)
    bw.write(1, 1)    # green code 1 -> 258 => length 3
    # distance: single-symbol code 1 -> _lz77_prefix_value(1) = 2
    #   -> _DIST_MAP[1] = (1, 0) -> dist 1
    data = _vp8l_container(bw.flush())
    out = webp.decode_webp(data)
    assert out.shape == (1, 4, 3)
    assert np.all(out[..., 0] == 10)   # r
    assert np.all(out[..., 1] == 5)    # g
    assert np.all(out[..., 2] == 20)   # b


def _write_two_symbol_simple_wide(bw, s0, s1):
    """simple prefix code, two symbols, second may exceed 255 — the
    spec's 8-bit second-symbol field caps at 255, so large green
    symbols need a normal code; emit one via the module's writer."""
    if s1 < 256:
        _write_two_symbol_simple(bw, s0, s1)
        return
    lengths = [0] * (256 + 24)
    lengths[s0] = 1
    lengths[s1] = 1
    webp._write_prefix_code(bw, lengths)


def test_color_cache_hit():
    # 3x1: literal green=9 pixel, cache hit replaying it, literal again
    cache_bits = 2
    px = (40 << 24) | (17 << 16) | (9 << 8) | 23  # a r g b
    idx = ((px * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = webp._BitWriter()
    bw.write(2, 14)
    bw.write(0, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)             # no transforms
    bw.write(1, 1)             # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)             # no meta prefix
    # green alphabet 256+24+4: literal 9 and cache symbol 280+idx
    lengths = [0] * (256 + 24 + (1 << cache_bits))
    lengths[9] = 1
    lengths[256 + 24 + idx] = 1
    webp._write_prefix_code(bw, lengths)
    for ch in (17, 23, 40):
        _write_single_symbol(bw, ch)
    _write_single_symbol(bw, 1)
    bw.write(0, 1)  # literal (symbol 9)
    bw.write(1, 1)  # cache hit
    bw.write(0, 1)  # literal again
    out = webp.decode_webp(_vp8l_container(bw.flush()))
    assert out.shape == (1, 3, 3)
    assert [tuple(p) for p in out[0]] == [(17, 9, 23)] * 3


def test_palette_via_decoder_internals():
    # drive the palette inverse directly: packed indices + palette
    w, h, pbits = 5, 2, 1  # 16>=colors>4 -> 2 px per byte
    palette = np.array(
        [(0xFF << 24) | (r << 16) | (r << 8) | r for r in (11, 22, 33, 44, 55)],
        dtype=np.uint32,
    )
    idx = np.array([[0, 1, 2, 3, 4], [4, 3, 2, 1, 0]], dtype=np.uint32)
    packed_w = (w + 1) >> 1
    packed = np.zeros(h * packed_w, dtype=np.uint32)
    for y in range(h):
        for x in range(w):
            b = int(idx[y, x]) << ((x & 1) * 4)
            packed[y * packed_w + (x >> 1)] |= b << 8
    # emulate the decoder's unpack+lookup branch
    out = np.zeros(w * h, dtype=np.uint32)
    grid = (packed.reshape(h, packed_w) >> 8) & 0xFF
    for y in range(h):
        for x in range(w):
            pxl = int(grid[y, x >> pbits])
            shift = (x & 1) * 4
            out[y * w + x] = palette[(pxl >> shift) & 0xF]
    assert [(v >> 16) & 0xFF for v in out[:5]] == [11, 22, 33, 44, 55]


# ------------------------------------------- transform inverse units


def test_subtract_green_inverse_formula():
    argb = np.array([(0xFF << 24) | (5 << 16) | (10 << 8) | 250], dtype=np.uint32)
    webp._subtract_green_inverse(argb)
    v = int(argb[0])
    assert (v >> 16) & 0xFF == 15         # r + g
    assert v & 0xFF == (250 + 10) % 256   # b + g mod 256


def test_predictor_inverse_left_mode():
    # 1x3 image, predictor mode 1 (Left) everywhere, residuals +1
    w, h, bits = 3, 1, 2
    argb = np.array(
        [(0x00 << 24) | 5, 1, 1], dtype=np.uint32
    )  # px0 abs (after +black pred a+=0xFF), then residual b=+1 twice
    pred_img = np.array([(1 << 8)], dtype=np.uint32)  # mode 1
    webp._apply_predictor_inverse(argb, w, h, bits, pred_img)
    # px0: + ARGB_BLACK -> a=0xFF, b=5; px1 = px0 + 1 -> b=6; px2 b=7
    assert [int(v) & 0xFF for v in argb] == [5, 6, 7]
    assert all((int(v) >> 24) & 0xFF == 0xFF for v in argb)


def test_predictor_inverse_select_and_clamp_modes_run():
    # smoke every mode 0..13 on a small residual field: decode must
    # not raise and must stay in byte range
    for mode in range(14):
        w = h = 4
        argb = np.ones(w * h, dtype=np.uint32) * 3
        pred_img = np.array([mode << 8] * 4, dtype=np.uint32)
        webp._apply_predictor_inverse(argb, w, h, 1, pred_img)
        assert argb.dtype == np.uint32


def test_color_transform_inverse_formula():
    # g2r=32 (1.0 in 5.3 fixed): red += (32 * g) >> 5 = g
    w = h = 1
    ct = np.array([(32 << 16)], dtype=np.uint32)
    argb = np.array([(0xFF << 24) | (0 << 16) | (7 << 8) | 0], dtype=np.uint32)
    webp._apply_color_transform_inverse(argb, w, h, 2, ct)
    assert (int(argb[0]) >> 16) & 0xFF == 7


# -------------------------------------------------- container paths


def test_animated_takes_first_vp8l_frame():
    arr = _rand(3, 5, seed=9)
    still = webp.encode_webp(arr)
    vp8l_chunk = still[12:]  # the VP8L chunk of the still
    anmf_payload = b"\x00" * 16 + vp8l_chunk
    anmf = b"ANMF" + struct.pack("<I", len(anmf_payload)) + anmf_payload
    if len(anmf_payload) & 1:
        anmf += b"\x00"
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x02\x00\x00\x00" + b"\x04\x00\x00\x02\x00\x00"
    body = b"WEBP" + vp8x + anmf
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    assert np.array_equal(webp.decode_webp(data), arr)


def test_lossy_vp8_routes_to_keyframe_decoder():
    # a garbage VP8 payload now reaches the RFC 6386 keyframe decoder
    # (vp8.py) instead of quarantining as unsupported; it must raise a
    # precise ValueError there, and a real keyframe must decode
    body = b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError):
        webp.decode_webp(data)
    from dataset_batch_processor_spark.multimodal import vp8

    rgb = _rand(18, 22, seed=8)
    assert webp.decode_webp(vp8.encode_webp_vp8(rgb, qi=12)).shape == (18, 22, 3)


def test_errors_and_truncation():
    with pytest.raises(ValueError):
        webp.decode_webp(b"nope")
    arr = _rand(6, 6, seed=1)
    enc = webp.encode_webp(arr)
    with pytest.raises(ValueError):
        webp.decode_webp(enc[: len(enc) // 2])


def test_registry_and_sniffing():
    arr = _rand(4, 7, seed=3)
    enc = webp.encode_webp(arr)
    assert np.array_equal(binary.decode_any("webp", enc), arr)
    # wrong extension, magic sniffed
    assert np.array_equal(binary.decode_any("xyz", enc), arr)


def test_header_probe_matches_decode():
    arr = _rand(9, 14, seed=4)
    enc = webp.encode_webp(arr)
    assert images.parse_webp_header(enc) == (14, 9)
