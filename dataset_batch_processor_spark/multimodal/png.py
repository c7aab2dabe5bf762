"""Pure-Python PNG codec (stdlib zlib + numpy) — no PIL required.

Replaces the NotImplementedError stub for the one format the sandbox
can genuinely support, so the reference's decode → crop/pad → encode
pipeline (S3/K1, /root/reference/modules/tiling.py:21,68 and
other_tasks.py:54-60) runs end-to-end on REAL image bytes.

Scope (raises NotImplementedError outside it, which the F7 quarantine
path catches per-row):

- the FULL spec-valid depth/type matrix (round 8): color types 0
  (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA) at bit
  depths 1/2/4 (gray + palette, MSB-first packed, filtered per byte
  per spec), 8, and 16 (big-endian pairs, filter step 2*channels);
  interlace 0 (sequential) and 1 (Adam7 — each of the 7 passes is an
  independently-filtered sub-image with its own scanline byte
  padding, PNG spec §8.2).
- decode always yields H x W x 3 uint8 RGB (gray replicated, palette
  resolved, alpha dropped — PIL ``convert("RGB")`` drops alpha the
  same way; 16-bit takes the top byte like the DNG/NEF tone map,
  sub-byte gray scales to full range like PIL ``convert("L")``).
- encode_png writes 8-bit RGB (color type 2), one filter type for
  all rows (0-4; default 0); encode_png_ex covers the full depth
  matrix so tests and roundtrip queries gate every decode branch on
  self-produced bytes.

Performance note: this runs inside Arrow ``mapInPandas`` batches.
Filters 0/1/2 decode fully vectorized (filter 1 is a per-channel
prefix sum mod 256); 3/4 vectorize across channels with a per-pixel
loop — acceptable for tile-sized images, and a real deployment
registers a C codec via ``register_codec`` anyway.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2).
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (int16 math, uint8 result)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _unfilter(raw: bytes, h: int, stride: int, fbpp: int) -> np.ndarray:
    """Reconstruct scanlines -> (h, stride) uint8. ``stride`` is the
    scanline byte length and ``fbpp`` the filter step (PNG spec
    max(1, channels*depth//8)) — sub-byte depths filter per byte."""
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: decompressed length mismatch")
    npix = stride // fbpp
    data = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes, rows = data[:, 0], data[:, 1:]
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft, cur = int(ftypes[y]), rows[y].copy()
        if ft == 0:
            line = cur
        elif ft == 1:  # Sub: prefix sum per channel offset (mod 256)
            line = cur
            for o in range(fbpp):
                line[o::fbpp] = (
                    np.cumsum(cur[o::fbpp], dtype=np.uint64) & 0xFF
                )
        elif ft == 2:  # Up
            line = cur + prev
        elif ft == 3:  # Average: sequential in x, vector across channels
            line = np.zeros(stride, dtype=np.uint8)
            for x in range(npix):
                s = slice(x * fbpp, (x + 1) * fbpp)
                left = (
                    line[s.start - fbpp:s.start]
                    if x else np.zeros(fbpp, np.uint8)
                )
                avg = (left.astype(np.int16) + prev[s].astype(np.int16)) >> 1
                line[s] = cur[s] + avg.astype(np.uint8)
        elif ft == 4:  # Paeth
            line = np.zeros(stride, dtype=np.uint8)
            zero = np.zeros(fbpp, np.uint8)
            for x in range(npix):
                s = slice(x * fbpp, (x + 1) * fbpp)
                left = line[s.start - fbpp:s.start] if x else zero
                upleft = prev[s.start - fbpp:s.start] if x else zero
                line[s] = cur[s] + _paeth(left, prev[s], upleft)
        else:
            raise ValueError(f"PNG: unknown filter type {ft}")
        recon[y] = line
        prev = line
    return recon


def _scanline_params(w: int, depth: int, channels: int) -> tuple[int, int]:
    """(scanline byte length, filter step) for a pass of width w."""
    stride = (w * channels * depth + 7) // 8
    fbpp = max(1, (channels * depth) // 8)
    return stride, fbpp


def _rows_to_samples(
    rows: np.ndarray, w: int, depth: int, channels: int
) -> np.ndarray:
    """(h, stride) reconstructed bytes -> (h, w, channels) samples:
    uint16 for depth 16 (big-endian pairs), uint8 otherwise
    (sub-byte depths unpack MSB-first per scanline)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * channels].reshape(h, w, channels)
    if depth == 16:
        flat = rows[:, : w * channels * 2].reshape(h, w * channels, 2)
        vals = (
            flat[:, :, 0].astype(np.uint16) << 8
        ) | flat[:, :, 1].astype(np.uint16)
        return vals.reshape(h, w, channels)
    bits = np.unpackbits(rows, axis=1)[:, : w * channels * depth]
    grouped = bits.reshape(h, w * channels, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (grouped * weights).sum(axis=2).astype(np.uint8)
    return vals.reshape(h, w, channels)


def _samples_to_rows(
    samples: np.ndarray, depth: int
) -> np.ndarray:
    """(h, w, channels) samples -> (h, stride) scanline bytes —
    inverse of _rows_to_samples."""
    h, w, channels = samples.shape
    if depth == 8:
        return samples.astype(np.uint8).reshape(h, w * channels)
    if depth == 16:
        flat = samples.astype(np.uint16).reshape(h, w * channels)
        out = np.empty((h, w * channels * 2), dtype=np.uint8)
        out[:, 0::2] = (flat >> 8).astype(np.uint8)
        out[:, 1::2] = (flat & 0xFF).astype(np.uint8)
        return out
    flat = samples.astype(np.uint8).reshape(h, w * channels)
    shifts = np.arange(depth - 1, -1, -1, dtype=np.uint8)
    bits = ((flat[:, :, None] >> shifts) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(h, -1), axis=1)


def _deinterlace_adam7(
    raw: bytes, h: int, w: int, depth: int, channels: int
) -> np.ndarray:
    """Adam7 stream -> (h, w, channels) samples. Each non-empty pass
    is an independently-filtered sub-image of ceil((w-x0)/dx) x
    ceil((h-y0)/dy) pixels (its scanlines independently byte-padded
    at sub-byte depths); unfiltered samples scatter back into the
    full frame at (y0 + i*dy, x0 + j*dx)."""
    dtype = np.uint16 if depth == 16 else np.uint8
    px = np.zeros((h, w, channels), dtype=dtype)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        if w <= x0 or h <= y0:
            continue  # pass empty for this geometry: zero bytes
        pw = -(-(w - x0) // dx)
        ph = -(-(h - y0) // dy)
        stride, fbpp = _scanline_params(pw, depth, channels)
        n = ph * (stride + 1)
        sub = _unfilter(raw[pos:pos + n], ph, stride, fbpp)
        pos += n
        px[y0::dy, x0::dx] = _rows_to_samples(sub, pw, depth, channels)
    if pos != len(raw):
        raise ValueError("PNG: decompressed length mismatch")
    return px


def decode_png(content: bytes) -> np.ndarray:
    """PNG bytes -> H x W x 3 uint8 RGB."""
    if content[: len(SIGNATURE)] != SIGNATURE:
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = len(SIGNATURE), None, None, []
    while pos < len(content):
        (length,) = struct.unpack(">I", content[pos:pos + 4])
        tag = content[pos + 4:pos + 8]
        payload = content[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG: missing IHDR or IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if ctype not in _CHANNELS:
        raise NotImplementedError(f"PNG: color type {ctype} not supported")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"PNG: invalid bit depth {depth}")
    # spec-valid depth/type combinations (PNG spec §11.2.2)
    if depth < 8 and ctype not in (0, 3):
        raise ValueError(f"PNG: depth {depth} invalid for color type {ctype}")
    if depth == 16 and ctype == 3:
        raise ValueError("PNG: 16-bit palette images are invalid")
    if interlace not in (0, 1):
        raise ValueError(f"PNG: unknown interlace method {interlace}")
    if comp != 0 or filt != 0:
        raise ValueError("PNG: nonstandard compression/filter method")
    channels = _CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    if interlace == 1:
        samples = _deinterlace_adam7(raw, h, w, depth, channels)
    else:
        stride, fbpp = _scanline_params(w, depth, channels)
        samples = _rows_to_samples(
            _unfilter(raw, h, stride, fbpp), w, depth, channels
        )
    # to the 8-bit display domain: 16-bit takes the top byte (the
    # DNG/NEF tone-map policy), sub-byte GRAY scales to full range
    # (PIL's convert("L") does the same); palette indexes are used
    # as-is regardless of depth
    if depth == 16:
        px = (samples >> 8).astype(np.uint8)
    elif depth < 8 and ctype == 0:
        px = (
            samples.astype(np.uint16) * 255 // ((1 << depth) - 1)
        ).astype(np.uint8)
    else:
        px = samples.astype(np.uint8)
    if ctype == 2:
        return px
    if ctype == 6:  # RGBA -> drop alpha
        return np.ascontiguousarray(px[:, :, :3])
    if ctype == 0:  # gray -> replicate
        return np.repeat(px, 3, axis=2)
    if ctype == 4:  # gray+alpha -> replicate gray, drop alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    if plte is None:
        raise ValueError("PNG: palette image without PLTE")
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= len(plte):
        raise ValueError("PNG: palette index out of range")
    return plte[idx]


def _filter_scanlines(arr: np.ndarray, filter_type: int) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w*3 + 1) filtered scanlines."""
    h, w, bpp = arr.shape
    return _filter_rows(
        np.ascontiguousarray(arr).reshape(h, w * bpp), bpp, filter_type
    )


def _filter_rows(
    cur: np.ndarray, bpp: int, filter_type: int
) -> np.ndarray:
    """(h, stride) uint8 scanline bytes -> (h, stride + 1) filtered
    (filter byte prepended), filter step ``bpp``. Vectorizes fully
    for all five filters because encode predictors read the ORIGINAL
    neighbor bytes."""
    h, stride = cur.shape
    left = np.zeros_like(cur)
    left[:, bpp:] = cur[:, :-bpp]
    up = np.zeros_like(cur)
    up[1:] = cur[:-1]
    upleft = np.zeros_like(cur)
    upleft[1:, bpp:] = cur[:-1, :-bpp]
    if filter_type == 0:
        filtered = cur
    elif filter_type == 1:
        filtered = cur - left
    elif filter_type == 2:
        filtered = cur - up
    elif filter_type == 3:
        filtered = cur - (
            (left.astype(np.int16) + up.astype(np.int16)) >> 1
        ).astype(np.uint8)
    elif filter_type == 4:
        filtered = cur - _paeth(left, up, upleft)
    else:
        raise ValueError(f"unknown filter type {filter_type}")
    scan = np.zeros((h, stride + 1), dtype=np.uint8)
    scan[:, 0] = filter_type
    scan[:, 1:] = filtered
    return scan


def encode_png(
    arr: np.ndarray, filter_type: int = 0, level: int = 6,
    interlace: bool = False,
) -> bytes:
    """H x W x 3 (or H x W gray) uint8 -> 8-bit RGB PNG bytes.

    ``filter_type`` applies to every row. ``interlace=True`` writes
    Adam7: each of the 7 passes gathered by stride and filtered as its
    own sub-image (exists mainly so tests and the roundtrip queries
    can exercise the interlaced decode with self-produced bytes —
    sequential compresses better and is what the engine emits)."""
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_png expects H x W x 3 uint8")
    h, w, _ = arr.shape
    if h == 0 or w == 0:
        raise ValueError("encode_png: empty image")
    if interlace:
        parts = [
            _filter_scanlines(arr[y0::dy, x0::dx], filter_type).tobytes()
            for x0, y0, dx, dy in _ADAM7
            if w > x0 and h > y0
        ]
        body = b"".join(parts)
    else:
        body = _filter_scanlines(arr, filter_type).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, int(interlace))
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(body, level))
        + _chunk(b"IEND", b"")
    )


def encode_png_ex(
    samples: np.ndarray,
    depth: int = 8,
    ctype: int = 0,
    plte: np.ndarray | None = None,
    filter_type: int = 0,
    level: int = 6,
    interlace: bool = False,
) -> bytes:
    """Full-depth PNG writer: gray/palette at 1/2/4/8 bits, gray/RGB/
    gray+alpha/RGBA at 8/16 bits — the encode twin of the extended
    decoder, so roundtrip queries and tests can gate every depth
    branch on self-produced bytes.

    ``samples``: (H, W) for color types 0/3, (H, W, channels)
    otherwise; uint16 required for depth 16, uint8 below. Palette
    images need ``plte`` (N, 3) uint8. Filtering uses the spec's
    byte-step (sub-byte depths filter per byte)."""
    if ctype not in _CHANNELS:
        raise ValueError(f"invalid color type {ctype}")
    channels = _CHANNELS[ctype]
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid bit depth {depth}")
    if depth < 8 and ctype not in (0, 3):
        raise ValueError(f"depth {depth} invalid for color type {ctype}")
    if depth == 16 and ctype == 3:
        raise ValueError("16-bit palette images are invalid")
    want_dtype = np.uint16 if depth == 16 else np.uint8
    if samples.ndim == 2 and channels == 1:
        samples = samples[:, :, None]
    if (
        samples.ndim != 3
        or samples.shape[2] != channels
        or samples.dtype != want_dtype
    ):
        raise ValueError(
            f"expected (H, W, {channels}) {np.dtype(want_dtype).name} "
            f"for color type {ctype} at depth {depth}"
        )
    if depth < 16 and int(samples.max(initial=0)) >= 1 << depth:
        raise ValueError(f"samples out of range for depth {depth}")
    if ctype == 3:
        if plte is None:
            raise ValueError("palette images need plte")
        if int(samples.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
    h, w = samples.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("encode_png_ex: empty image")
    _, fbpp = _scanline_params(w, depth, channels)

    def pass_bytes(sub: np.ndarray) -> bytes:
        return _filter_rows(
            _samples_to_rows(sub, depth), fbpp, filter_type
        ).tobytes()

    if interlace:
        body = b"".join(
            pass_bytes(samples[y0::dy, x0::dx])
            for x0, y0, dx, dy in _ADAM7
            if w > x0 and h > y0
        )
    else:
        body = pass_bytes(samples)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, int(interlace))
    out = SIGNATURE + _chunk(b"IHDR", ihdr)
    if ctype == 3:
        out += _chunk(b"PLTE", np.ascontiguousarray(plte, np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(body, level))
    out += _chunk(b"IEND", b"")
    return out
