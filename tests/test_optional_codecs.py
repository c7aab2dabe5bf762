"""Optional-library codec wiring (multimodal/optional_codecs.py).

Reference behavior: pillow_heif registered process-wide
(/root/reference/batch_processor.py:11-22), camera RAW via imageio
(/root/reference/modules/other_tasks.py:45-51). The libraries are not
in this container, so the live-decode tests skip; what always runs is
the contract that matters here: absent the library, the stub raises
NotImplementedError with a reason (F7 quarantine), and the registry
precedence lets an installed library win.
"""

from __future__ import annotations

import importlib.util

import numpy as np
import pytest

from dataset_batch_processor_spark.multimodal import binary, optional_codecs

_HAVE_HEIF = importlib.util.find_spec("pillow_heif") is not None
_HAVE_RAWPY = importlib.util.find_spec("rawpy") is not None


def test_stub_raises_with_reason_when_library_absent():
    # heic stays a library-bound stub pointing at register_codec
    for fmt in ("heic",):
        if fmt in optional_codecs.REGISTERED:
            continue  # a real library is installed in this env
        with pytest.raises(NotImplementedError, match="register_codec"):
            binary.CODECS[fmt](b"\x00" * 64)
    # cr2/nef (round 7) and arw (round 8) are REAL pure-Python
    # decoders (multimodal/rawvendor.py): garbage fails with a
    # precise container reason, never a missing-library hint
    for fmt in ("cr2", "nef", "arw"):
        if fmt in optional_codecs.REGISTERED:
            continue
        with pytest.raises(ValueError):
            binary.CODECS[fmt](b"\x00" * 64)


def test_try_register_is_idempotent_and_quiet():
    before = dict(optional_codecs.REGISTERED)
    out = optional_codecs.try_register_optional_codecs()
    assert out == optional_codecs.REGISTERED
    assert {k: v for k, v in out.items() if k in before} == before


def test_registered_codec_wins_over_stub():
    """register_codec precedence (fixed in r3): an installed decoder
    must win for both extension dispatch and sniffed content."""
    sentinel = np.zeros((2, 2, 3), dtype=np.uint8)
    old = binary.CODECS.get("heic")
    try:
        binary.register_codec("heic", lambda content: sentinel)
        out = binary.decode_any("heic", b"not-sniffable-garbage")
        assert out is sentinel
    finally:
        binary.CODECS["heic"] = old


@pytest.mark.skipif(not _HAVE_HEIF, reason="pillow-heif not installed")
def test_heic_roundtrip_with_pillow_heif():
    import io

    import pillow_heif

    arr = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    heif = pillow_heif.from_bytes(
        mode="RGB", size=(8, 8), data=arr.tobytes()
    )
    buf = io.BytesIO()
    heif.save(buf, quality=-1)  # -1 = lossless
    dec = binary.decode_any("heic", buf.getvalue())
    assert dec.shape == (8, 8, 3)
    assert np.array_equal(dec, arr)


@pytest.mark.skipif(not _HAVE_RAWPY, reason="rawpy not installed")
def test_raw_decode_registered_with_rawpy():
    assert optional_codecs.REGISTERED.get("cr2") == "rawpy"
    assert binary.CODECS["cr2"] is binary.CODECS["nef"]


def test_libwebp_native_fast_path():
    """When the system libwebp .so is present (as in this container),
    the registry's webp decoder is the ctypes fast path; it must agree
    byte-for-byte with the pure decoder on lossless streams and decode
    our lossy VP8 keyframes. Skips cleanly where the library is absent."""
    if optional_codecs._libwebp_decoder() is None:
        pytest.skip("system libwebp not present")
    optional_codecs.try_register_optional_codecs()
    assert optional_codecs.REGISTERED.get("webp") == "libwebp+pure"
    from dataset_batch_processor_spark.multimodal import vp8, webp

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    lossless = webp.encode_webp(arr)
    assert np.array_equal(binary.decode_any("webp", lossless), arr)
    lossy = vp8.encode_webp_vp8(arr, qi=30)
    dec = binary.decode_any("webp", lossy)
    assert dec.shape == (13, 21, 3)


def test_libheif_native_heic_and_avif():
    """With the system libheif present (as in this container), HEIC —
    the reference's iPhone-dump format — and AVIF decode on a bare
    install with NO Python codec package: encode through the
    library's own HEVC/AV1 encoders, decode through the registry,
    with content sniffing overriding a lying extension. Closes the
    'HEIC lands in quarantine' gap whenever the .so exists; skips
    cleanly where it doesn't."""
    if optional_codecs._libheif() is None:
        pytest.skip("system libheif not present")
    optional_codecs.try_register_optional_codecs()
    rng = np.random.default_rng(11)
    # smooth content: lossy HEVC/AV1 at q95 stays within a few codes
    yy, xx = np.mgrid[0:40, 0:56]
    rgb = np.clip(
        np.stack([xx * 3 + 20, yy * 2 + 40, xx + yy], axis=2)
        + rng.integers(-2, 2, (40, 56, 3)),
        0,
        255,
    ).astype(np.uint8)
    for fmt, brand in (("heic", b"heic"), ("avif", b"avif")):
        assert optional_codecs.REGISTERED.get(fmt) in ("libheif", "pillow_heif")
        data = optional_codecs.libheif_encode_rgb(rgb, fmt, quality=95)
        assert data[8:12] == brand
        dec = binary.decode_any(fmt, data)
        assert dec.shape == rgb.shape
        assert int(np.abs(dec.astype(int) - rgb.astype(int)).max()) <= 8
        # sniffing: the extension lies, the ftyp brand wins
        dec2 = binary.decode_any("jpg", data)
        assert np.array_equal(dec, dec2)


def test_avif_stub_raises_when_no_library():
    if "avif" in optional_codecs.REGISTERED:
        pytest.skip("a real avif decoder is registered in this env")
    with pytest.raises(NotImplementedError, match="register_codec"):
        binary.CODECS["avif"](b"\x00" * 64)
