"""Optional public-library codec bindings.

The reference process-wide registers pillow_heif so PIL transparently
opens ``.heic`` (/root/reference/batch_processor.py:11-22, extension
list at modules/filter_crop.py:39) and decodes camera RAW through
``imageio.v3.imread`` (/root/reference/modules/other_tasks.py:45-51).
This container ships neither library, so the built-in registry stubs
those formats into the F7 quarantine with a precise reason
(binary._missing_codec).

This module is the documented integration point made automatic: when
the public libraries ARE importable (a full deployment), the matching
decoders are registered via ``register_codec`` at import time and win
over the stubs; when they are not, nothing changes and the quarantine
path stays. Everything is lazily probed per library, so a partial
install (say pillow-heif without rawpy) still wires what it can.

Each registered decoder returns HxWx3 uint8 RGB — the array contract
every pixel kernel in this package assumes.
"""

from __future__ import annotations

import io
from collections.abc import Callable

import numpy as np

#: filled by :func:`try_register_optional_codecs` — fmt -> library name
REGISTERED: dict[str, str] = {}


def _to_rgb_array(im) -> np.ndarray:
    """PIL image -> HxWx3 uint8 (P12 RGB-coercion parity: the
    reference converts to RGB before JPEG save, other_tasks.py:53)."""
    arr = np.asarray(im.convert("RGB"), dtype=np.uint8)
    return np.ascontiguousarray(arr)


def _heic_decoder() -> Callable[[bytes], np.ndarray] | None:
    try:
        import pillow_heif
        from PIL import Image
    except ImportError:
        return None
    # same process-wide opener hook the reference installs
    pillow_heif.register_heif_opener()

    def decode_heic(content: bytes) -> np.ndarray:
        return _to_rgb_array(Image.open(io.BytesIO(content)))

    return decode_heic


def _rawpy_decoder() -> Callable[[bytes], np.ndarray] | None:
    try:
        import rawpy
    except ImportError:
        return None

    def decode_raw(content: bytes) -> np.ndarray:
        with rawpy.imread(io.BytesIO(content)) as raw:
            rgb = raw.postprocess(output_bps=8)
        return np.ascontiguousarray(rgb.astype(np.uint8))

    return decode_raw


def _imageio_decoder() -> Callable[[bytes], np.ndarray] | None:
    """imageio.v3 generic fallback — the reference's RAW/legacy-WebP
    route (other_tasks.py:45-51, batch_processor.py:352-357)."""
    try:
        import imageio.v3 as iio
    except ImportError:
        return None

    def decode_imageio(content: bytes) -> np.ndarray:
        arr = np.asarray(iio.imread(content, index=0))  # first frame
        # bit-depth normalization BEFORE the uint8 cast: a plain
        # astype would wrap 16-bit RAW/PNG pixels modulo 256
        if arr.dtype == np.uint16:
            arr = (arr.astype(np.uint32) * 255 // 65535).astype(np.uint8)
        elif arr.dtype != np.uint8:
            a = arr.astype(np.float64)
            lo, hi = float(a.min()), float(a.max())
            scale = 255.0 / (hi - lo) if hi > lo else 0.0
            arr = ((a - lo) * scale).astype(np.uint8)
        # channel normalization to the HxWx3 contract
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=2)
        elif arr.shape[2] == 1:  # gray-with-axis
            arr = np.repeat(arr, 3, axis=2)
        elif arr.shape[2] == 2:  # gray + alpha: keep luma
            arr = np.repeat(arr[:, :, :1], 3, axis=2)
        elif arr.shape[2] >= 4:  # drop alpha / extra planes
            arr = arr[:, :, :3]
        return np.ascontiguousarray(arr)

    return decode_imageio


# ------------------------------------------------ system libheif
# Like the libwebp binding below: many base images ship libheif.so
# (with libde265/x265 for HEVC and dav1d/aom for AV1), so HEIC — the
# reference's iPhone-dump format — and AVIF decode WITHOUT any Python
# package. heif_error is returned BY VALUE (a ctypes Structure
# restype); encoding writes through heif_context_write_to_file
# because ctypes callbacks cannot return structs by value.

_HEIF_RGB, _HEIF_ILV, _HEIF_CH = 1, 10, 10  # colorspace/chroma/channel enums
_HEIF_FMT = {"heic": 1, "avif": 4}  # heif_compression_HEVC / _AV1
_libheif_cache: list = []


def _libheif():
    """Bind the system libheif once; returns None when absent."""
    if _libheif_cache:
        return _libheif_cache[0]
    import ctypes
    import ctypes.util

    lib = None
    for name in ("libheif.so.1", "libheif.so", ctypes.util.find_library("heif")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lib is None or not hasattr(lib, "heif_decode_image"):
        _libheif_cache.append(None)
        return None

    class HeifError(ctypes.Structure):
        _fields_ = [
            ("code", ctypes.c_int),
            ("subcode", ctypes.c_int),
            ("message", ctypes.c_char_p),
        ]

    P = ctypes.c_void_p
    u8p = ctypes.POINTER(ctypes.c_uint8)
    sig = {
        "heif_context_alloc": (P, []),
        "heif_context_free": (None, [P]),
        "heif_context_read_from_memory_without_copy":
            (HeifError, [P, ctypes.c_char_p, ctypes.c_size_t, P]),
        "heif_context_get_primary_image_handle": (HeifError, [P, ctypes.POINTER(P)]),
        "heif_decode_image": (HeifError, [P, ctypes.POINTER(P), ctypes.c_int, ctypes.c_int, P]),
        "heif_image_handle_get_width": (ctypes.c_int, [P]),
        "heif_image_handle_get_height": (ctypes.c_int, [P]),
        "heif_image_handle_release": (None, [P]),
        "heif_image_release": (None, [P]),
        "heif_image_get_plane_readonly": (u8p, [P, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]),
        "heif_context_get_encoder_for_format": (HeifError, [P, ctypes.c_int, ctypes.POINTER(P)]),
        "heif_encoder_set_lossy_quality": (HeifError, [P, ctypes.c_int]),
        "heif_encoder_set_parameter_string":
            (HeifError, [P, ctypes.c_char_p, ctypes.c_char_p]),
        "heif_encoder_release": (None, [P]),
        "heif_image_create": (HeifError, [ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.POINTER(P)]),
        "heif_image_add_plane": (HeifError, [P, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]),
        "heif_image_get_plane": (u8p, [P, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]),
        "heif_context_encode_image": (HeifError, [P, P, P, P, ctypes.POINTER(P)]),
        "heif_context_write_to_file": (HeifError, [P, ctypes.c_char_p]),
    }
    try:
        for name, (res, args) in sig.items():
            fn = getattr(lib, name)
            fn.restype = res
            fn.argtypes = args
    except AttributeError:
        _libheif_cache.append(None)
        return None
    _libheif_cache.append((lib, HeifError, P, ctypes))
    return _libheif_cache[0]


def _heif_check(err, what: str) -> None:
    if err.code != 0:
        msg = err.message.decode("utf-8", "replace") if err.message else "?"
        raise ValueError(f"libheif: {what} failed: {msg}")


def _libheif_decoder() -> Callable[[bytes], np.ndarray] | None:
    bound = _libheif()
    if bound is None:
        return None
    lib, HeifError, P, ctypes = bound

    def decode_heif_native(content: bytes) -> np.ndarray:
        # release every native object on ALL paths: a corpus scan
        # quarantines corrupt files by catching our ValueError, so an
        # error path that leaks the handle or the (multi-megapixel)
        # decoded image would accumulate invisible native memory in
        # long-lived executors
        ctx = lib.heif_context_alloc()
        handle = P()
        img = P()
        try:
            _heif_check(
                lib.heif_context_read_from_memory_without_copy(
                    ctx, content, len(content), None
                ),
                "read",
            )
            _heif_check(
                lib.heif_context_get_primary_image_handle(ctx, ctypes.byref(handle)),
                "primary handle",
            )
            w = lib.heif_image_handle_get_width(handle)
            h = lib.heif_image_handle_get_height(handle)
            _heif_check(
                lib.heif_decode_image(
                    handle, ctypes.byref(img), _HEIF_RGB, _HEIF_ILV, None
                ),
                "decode",
            )
            stride = ctypes.c_int()
            p = lib.heif_image_get_plane_readonly(img, _HEIF_CH, ctypes.byref(stride))
            return (
                np.ctypeslib.as_array(p, shape=(h, stride.value))[:, : w * 3]
                .reshape(h, w, 3)
                .copy()
            )
        finally:
            if img:
                lib.heif_image_release(img)
            if handle:
                lib.heif_image_handle_release(handle)
            lib.heif_context_free(ctx)

    return decode_heif_native


def libheif_encode_rgb(rgb: np.ndarray, fmt: str = "heic", quality: int = 90) -> bytes:
    """Encode RGB to HEIC (HEVC) or AVIF (AV1) through the system
    libheif — fixture/test helper and a real sink when the library is
    present. Raises ValueError when libheif (or the format's encoder
    plugin) is unavailable."""
    import os
    import tempfile

    bound = _libheif()
    if bound is None:
        raise ValueError("libheif: system library not available")
    lib, HeifError, P, ctypes = bound
    h, w = rgb.shape[:2]
    ctx = lib.heif_context_alloc()
    enc = P()
    img = P()
    try:
        _heif_check(
            lib.heif_context_get_encoder_for_format(
                ctx, _HEIF_FMT[fmt], ctypes.byref(enc)
            ),
            f"{fmt} encoder",
        )
        lib.heif_encoder_set_lossy_quality(enc, quality)
        if fmt == "heic":
            # x265 spawns a CPU-count thread pool PER CALL by default
            # — measured 71 ms -> 11 ms per tiny image single-process,
            # and far worse under mapInPandas full-width contention.
            # Our callers parallelize across rows; the encoder must
            # not also parallelize within one. Ignore failures (older
            # libheif builds without the passthrough params).
            for k, v in ((b"x265:pools", b"1"), (b"x265:frame-threads", b"1")):
                lib.heif_encoder_set_parameter_string(enc, k, v)
        _heif_check(
            lib.heif_image_create(w, h, _HEIF_RGB, _HEIF_ILV, ctypes.byref(img)),
            "image create",
        )
        _heif_check(lib.heif_image_add_plane(img, _HEIF_CH, w, h, 24), "add plane")
        stride = ctypes.c_int()
        p = lib.heif_image_get_plane(img, _HEIF_CH, ctypes.byref(stride))
        np.ctypeslib.as_array(p, shape=(h, stride.value))[:, : w * 3] = rgb.reshape(
            h, w * 3
        )
        _heif_check(lib.heif_context_encode_image(ctx, img, enc, None, None), "encode")
        fd, path = tempfile.mkstemp(suffix=f".{fmt}")
        os.close(fd)
        try:
            _heif_check(lib.heif_context_write_to_file(ctx, path.encode()), "write")
            with open(path, "rb") as fh:
                return fh.read()
        finally:
            os.unlink(path)
    finally:
        if img:
            lib.heif_image_release(img)
        if enc:
            lib.heif_encoder_release(enc)
        lib.heif_context_free(ctx)


def _libwebp_decoder() -> Callable[[bytes], np.ndarray] | None:
    """ctypes binding to the SYSTEM libwebp shared library (no Python
    package needed — many base images ship the .so). Native-speed
    WebP decode for both lossless and lossy stills; returns None when
    the library is absent."""
    import ctypes
    import ctypes.util

    lib = None
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lib is None or not hasattr(lib, "WebPDecodeRGB"):
        return None
    lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGB.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]

    def decode_webp_native(content: bytes) -> np.ndarray:
        w = ctypes.c_int()
        h = ctypes.c_int()
        ptr = lib.WebPDecodeRGB(content, len(content), ctypes.byref(w), ctypes.byref(h))
        if not ptr:
            raise ValueError("libwebp: decode failed")
        try:
            arr = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 3)).copy()
        finally:
            lib.WebPFree(ptr)
        return arr

    return decode_webp_native


def try_register_optional_codecs() -> dict[str, str]:
    """Wire every importable optional library into the codec registry;
    returns {fmt: library} for what was actually registered. Idempotent
    and safe to call when nothing is installed."""
    from .binary import register_codec

    heic = _heic_decoder()
    if heic is not None:
        register_codec("heic", heic)
        register_codec("heif", heic)
        REGISTERED.update({"heic": "pillow_heif", "heif": "pillow_heif"})

    heif_native = _libheif_decoder()
    if heif_native is not None:
        # system libheif: fills whatever pillow_heif didn't claim, and
        # is the only AVIF path (pillow_heif is HEIF-specific)
        for fmt in ("heic", "heif", "avif"):
            if fmt not in REGISTERED:
                register_codec(fmt, heif_native)
                REGISTERED[fmt] = "libheif"

    raw = _rawpy_decoder()
    if raw is not None:
        for fmt in ("cr2", "nef", "arw"):
            register_codec(fmt, raw)
            REGISTERED[fmt] = "rawpy"

    native_webp = _libwebp_decoder()
    if native_webp is not None:
        # fast path: system libwebp via ctypes, pure-Python RFC
        # decoders (webp.py VP8L + vp8.py VP8) as the fallback for
        # anything the C API rejects (e.g. animations, where the pure
        # path extracts the first frame). Lossless pixels are
        # identical either way; LOSSY RGB can differ between decoders
        # by the chroma upsampler (YUV is the spec-exact layer), so
        # oracle fixtures never route lossy webp through the registry.
        from .webp import decode_webp as _pure_webp_first

        def decode_webp_fast(content: bytes) -> np.ndarray:
            try:
                return native_webp(content)
            except ValueError:
                return _pure_webp_first(content)

        register_codec("webp", decode_webp_fast)
        REGISTERED["webp"] = "libwebp+pure"

    generic = _imageio_decoder()
    if generic is not None:
        # only fill formats no better-specific codec claimed: the
        # vendor-RAW family when rawpy is missing (imageio can read
        # many of them through its plugins)
        for fmt in ("cr2", "nef", "arw"):
            if fmt not in REGISTERED:
                register_codec(fmt, generic)
                REGISTERED[fmt] = "imageio"
        # WebP last resort when neither libwebp nor the pure path
        # handles a stream (e.g. inter-frame-only payloads): the
        # reference's legacy route for lossy WebP is imageio
        # (batch_processor.py:352-357). Only claims the format when
        # the native binding is absent, and still tries the complete
        # pure decoder (VP8L + VP8 keyframe) first.
        if "webp" not in REGISTERED:
            from .webp import decode_webp as _pure_webp

            def decode_webp_chained(content: bytes) -> np.ndarray:
                try:
                    return _pure_webp(content)
                except NotImplementedError:
                    return generic(content)

            register_codec("webp", decode_webp_chained)
            REGISTERED["webp"] = "pure+imageio"

    return dict(REGISTERED)
