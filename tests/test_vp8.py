"""VP8 keyframe codec: bool-coder property roundtrips, encoder ->
decoder reconstruction equality, container routing, and — when the
system libwebp is present — bit-exact interop in BOTH directions
against the reference implementation, per header feature.

The interop tests are the authority on the RFC 6386 constant tables
(vp8_tables.py): every probability row a stream touches must agree
with libwebp's compiled-in copy for the arithmetic decode to stay
in sync, so a single wrong byte shows up as a frame-wide mismatch.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct

import numpy as np
import pytest

from dataset_batch_processor_spark.multimodal import vp8, webp
from dataset_batch_processor_spark.multimodal import vp8_tables as T

# ------------------------------------------------------- fixtures


def _img(h, w, seed=0, amp=20):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [(xx * 7) % 256, (yy * 5 + 30) % 256, (xx * 2 + yy * 3) % 256], axis=2
    )
    return np.clip(base + rng.integers(-amp, amp, (h, w, 3)), 0, 255).astype(np.uint8)


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        return lib
    return None


_LIB = _load_libwebp()
needs_libwebp = pytest.mark.skipif(_LIB is None, reason="system libwebp not present")


def _ref_decode_yuv(data):
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    s = ctypes.c_int()
    us = ctypes.c_int()
    y = _LIB.WebPDecodeYUV(
        data,
        len(data),
        ctypes.byref(w),
        ctypes.byref(h),
        ctypes.byref(u),
        ctypes.byref(v),
        ctypes.byref(s),
        ctypes.byref(us),
    )
    if not y:
        raise RuntimeError("libwebp decode failed")
    W, H, S, US = w.value, h.value, s.value, us.value
    CH, CW = (H + 1) // 2, (W + 1) // 2
    out = (
        np.ctypeslib.as_array(y, shape=(H, S))[:, :W].copy(),
        np.ctypeslib.as_array(u, shape=(CH, US))[:, :CW].copy(),
        np.ctypeslib.as_array(v, shape=(CH, US))[:, :CW].copy(),
    )
    _LIB.WebPFree(y)
    return out


def _ref_encode_rgb(rgb, quality=75.0):
    h, w = rgb.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeRGB(rgb.tobytes(), w, h, w * 3, quality, ctypes.byref(out))
    if n == 0:
        raise RuntimeError("libwebp encode failed")
    data = bytes(np.ctypeslib.as_array(out, shape=(n,)))
    _LIB.WebPFree(out)
    return data


def _extract_vp8(container):
    pos = 12
    while pos + 8 <= len(container):
        fcc = container[pos : pos + 4]
        sz = struct.unpack("<I", container[pos + 4 : pos + 8])[0]
        if fcc == b"VP8 ":
            return container[pos + 8 : pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    raise ValueError("no VP8 chunk")


def _planes_equal(a, b):
    return all(np.array_equal(x, y) for x, y in zip(a, b))


# ------------------------------------------------------- bool coder


def test_bool_coder_roundtrip_random():
    rng = np.random.default_rng(42)
    for _ in range(50):
        n = int(rng.integers(1, 500))
        seq = [(int(rng.integers(0, 2)), int(rng.integers(1, 255))) for _ in range(n)]
        enc = vp8.BoolEncoder()
        for b, p in seq:
            enc.bit(b, p)
        dec = vp8.BoolDecoder(enc.flush())
        for b, p in seq:
            assert dec.bit(p) == b


def test_bool_coder_literals_trees():
    enc = vp8.BoolEncoder()
    enc.literal(0x5A, 8)
    enc.signed_literal(-17, 6)
    enc.tree(T.KF_YMODE_TREE, T.KF_YMODE_PROBS, T.TM_PRED)
    enc.tree(T.BMODE_TREE, T.KF_BMODE_PROBS[:9], T.B_HU_PRED)
    enc.tree(T.COEFF_TOKEN_TREE, [128] * 11, T.DCT_CAT3, start=2)
    dec = vp8.BoolDecoder(enc.flush())
    assert dec.literal(8) == 0x5A
    assert dec.signed_literal(6) == -17
    assert dec.tree(T.KF_YMODE_TREE, T.KF_YMODE_PROBS) == T.TM_PRED
    assert dec.tree(T.BMODE_TREE, T.KF_BMODE_PROBS[:9]) == T.B_HU_PRED
    assert dec.tree(T.COEFF_TOKEN_TREE, [128] * 11, start=2) == T.DCT_CAT3


def test_table_shapes():
    assert len(T.COEFF_PROBS) == 4 * 8 * 3 * 11
    assert len(T.COEFF_UPDATE_PROBS) == 4 * 8 * 3 * 11
    assert len(T.KF_BMODE_PROBS) == 10 * 10 * 9
    assert len(T.DC_QLOOKUP) == len(T.AC_QLOOKUP) == 128
    assert all(T.DC_QLOOKUP[i] <= T.DC_QLOOKUP[i + 1] for i in range(127))
    assert T.DC_QLOOKUP[117] == 132  # the spec's chroma-DC value cap


# ------------------------------------------- self-consistent roundtrip


@pytest.mark.parametrize(
    "h,w,qi,bp",
    [(16, 16, 40, 0), (32, 48, 40, 0), (24, 20, 60, 0), (32, 32, 40, 3), (17, 33, 20, 2)],
)
def test_encode_decode_recon_equality(h, w, qi, bp):
    rgb = _img(h, w, seed=h * 7 + w)
    stream, recon = vp8.encode_vp8_with_recon(rgb, qi=qi, bpred_every=bp)
    assert _planes_equal(vp8.decode_vp8_yuv(stream), recon)


def test_encode_quality_bounded():
    rgb = _img(32, 32, seed=9, amp=5)
    stream, _ = vp8.encode_vp8_with_recon(rgb, qi=10)
    y, u, v = vp8.decode_vp8_yuv(stream)
    ys, us, vs = vp8.rgb_to_yuv420(rgb)
    assert int(np.abs(y.astype(int) - ys.astype(int)).max()) <= 12


def test_container_roundtrip_and_inter_frame_rejected():
    rgb = _img(20, 28, seed=4)
    container = vp8.encode_webp_vp8(rgb, qi=20)
    out = webp.decode_webp(container)
    assert out.shape == (20, 28, 3)
    stream = _extract_vp8(container)
    with pytest.raises(NotImplementedError):
        vp8.decode_vp8(bytes([stream[0] | 1]) + stream[1:])  # inter-frame bit


# ---------------------------------------------- libwebp interop gates


@needs_libwebp
@pytest.mark.parametrize("mode", list(range(10)))
def test_interop_every_submode(mode):
    """Our stream, one forced 4x4 submode everywhere -> libwebp must
    reconstruct the identical YUV planes (pins predictor formulas
    and the KF_BMODE_PROBS rows those mode strings walk)."""
    rgb = _img(48, 48, seed=3)
    container = vp8.encode_webp_vp8(rgb, qi=30, bpred_every=1, submode_cycle=mode)
    _, recon = vp8.encode_vp8_with_recon(
        rgb, qi=30, bpred_every=1, submode_cycle=mode
    )
    assert _planes_equal(_ref_decode_yuv(container), recon)


@needs_libwebp
@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"bpred_every": 3},
        {"seg_quants": [20, 40, 60, 80]},
        {"prob_updates": {34: 40, 1000: 200, 528: 99}},
        {"filter_level": 20},
        {"filter_level": 35, "sharpness": 3},
        {"filter_level": 20, "filter_type": 1},
    ],
    ids=["plain", "bpred", "segmentation", "prob-updates", "filter", "sharp", "simple"],
)
def test_interop_feature_matrix(kw):
    """Each header feature in isolation: our encoder emits it, and
    both decoders (ours and libwebp) must produce identical YUV."""
    rgb = _img(48, 48, seed=6)
    container = vp8.encode_webp_vp8(rgb, qi=30, **kw)
    ours = vp8.decode_vp8_yuv(_extract_vp8(container))
    assert _planes_equal(_ref_decode_yuv(container), ours)


@needs_libwebp
@pytest.mark.parametrize(
    "h,w,quality", [(32, 32, 75.0), (48, 64, 50.0), (33, 17, 30.0), (128, 96, 75.0)]
)
def test_interop_decode_real_libwebp_streams(h, w, quality):
    """libwebp's own lossy encoder (segmentation, skip flags, i4x4,
    nonzero loop filter, probability updates) -> our decoder must be
    bit-identical to libwebp's decoder."""
    rgb = _img(h, w, seed=h + w, amp=25)
    container = _ref_encode_rgb(rgb, quality)
    ours = vp8.decode_vp8_yuv(_extract_vp8(container))
    assert _planes_equal(_ref_decode_yuv(container), ours)


def test_truncated_streams_terminate_with_errors():
    """Every truncation of a valid stream must either decode (the
    bool decoder reads past-the-end as zeros, like the reference
    implementations — trailing truncations can still reconstruct) or
    raise a precise error; never hang or crash the interpreter."""
    rgb = _img(32, 32, seed=12)
    stream = vp8.encode_vp8(rgb, qi=30, bpred_every=2)
    for cut in list(range(0, 12)) + [len(stream) // 4, len(stream) // 2]:
        try:
            y, u, v = vp8.decode_vp8_yuv(stream[:cut])
            assert y.shape == (32, 32)
        except (ValueError, NotImplementedError, IndexError):
            pass


def test_animated_lossy_first_frame_through_container():
    """ANMF-wrapped VP8 frame (animated lossy WebP): decode_webp must
    return the first frame via the keyframe decoder."""
    rgb = _img(20, 24, seed=13)
    stream = vp8.encode_vp8(rgb, qi=12)
    _, recon = vp8.encode_vp8_with_recon(rgb, qi=12)
    frame = b"VP8 " + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        frame += b"\x00"
    anmf_payload = bytes(16) + frame  # 16-byte frame header + chunks
    anmf = b"ANMF" + struct.pack("<I", len(anmf_payload)) + anmf_payload
    body = b"WEBP" + anmf
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    out = webp.decode_webp(data)
    assert out.shape == (20, 24, 3)
    assert np.array_equal(out, vp8.yuv420_to_rgb(*recon))


@needs_libwebp
@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (8, 8), (15, 15), (16, 1), (1, 16)])
def test_interop_tiny_dimensions(h, w):
    """Sub-macroblock frames: padding/cropping edges of the spec.
    Our stream must decode bit-identically through libwebp."""
    rgb = _img(h, w, seed=h * 31 + w)
    container = vp8.encode_webp_vp8(rgb, qi=10)
    _, recon = vp8.encode_vp8_with_recon(rgb, qi=10)
    assert _planes_equal(_ref_decode_yuv(container), recon)
    assert _planes_equal(vp8.decode_vp8_yuv(_extract_vp8(container)), recon)
