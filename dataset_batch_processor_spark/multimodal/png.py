"""Pure-Python PNG codec (stdlib zlib + numpy) — no PIL required.

Replaces the NotImplementedError stub for the one format the sandbox
can genuinely support, so the reference's decode → crop/pad → encode
pipeline (S3/K1, /root/reference/modules/tiling.py:21,68 and
other_tasks.py:54-60) runs end-to-end on REAL image bytes.

Scope (raises NotImplementedError outside it, which the F7 quarantine
path catches per-row):

- 8-bit samples; color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA); interlace 0 (sequential) and 1 (Adam7 —
  each of the 7 passes is an independently-filtered sub-image, PNG
  spec §8.2; decode reuses the scanline unfilter per pass and
  scatters by stride, encode gathers by stride and filters per pass).
- decode always yields H x W x 3 uint8 RGB (gray replicated, palette
  resolved, alpha dropped — PIL ``convert("RGB")`` drops alpha the
  same way).
- encode writes 8-bit RGB (color type 2), one filter type for all
  rows (0-4; default 0). All five filters are implemented on both
  sides; encode of 1-4 exists mainly so tests can exercise every
  decode branch with self-produced bytes.

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


def _unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Reconstruct scanlines -> (h, w*bpp) uint8."""
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: decompressed length mismatch")
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
            for o in range(bpp):
                line[o::bpp] = np.cumsum(cur[o::bpp], dtype=np.uint64) & 0xFF
        elif ft == 2:  # Up
            line = cur + prev
        elif ft == 3:  # Average: sequential in x, vector across channels
            line = np.zeros(stride, dtype=np.uint8)
            for x in range(w):
                s = slice(x * bpp, (x + 1) * bpp)
                left = line[s.start - bpp:s.start] if x else np.zeros(bpp, np.uint8)
                avg = (left.astype(np.int16) + prev[s].astype(np.int16)) >> 1
                line[s] = cur[s] + avg.astype(np.uint8)
        elif ft == 4:  # Paeth
            line = np.zeros(stride, dtype=np.uint8)
            zero = np.zeros(bpp, np.uint8)
            for x in range(w):
                s = slice(x * bpp, (x + 1) * bpp)
                left = line[s.start - bpp:s.start] if x else zero
                upleft = prev[s.start - bpp:s.start] if x else zero
                line[s] = cur[s] + _paeth(left, prev[s], upleft)
        else:
            raise ValueError(f"PNG: unknown filter type {ft}")
        recon[y] = line
        prev = line
    return recon


def _deinterlace_adam7(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Adam7 stream -> (h, w, bpp) uint8. Each non-empty pass is an
    independently-filtered sub-image of ceil((w-x0)/dx) x
    ceil((h-y0)/dy) pixels; unfiltered samples scatter back into the
    full frame at (y0 + i*dy, x0 + j*dx)."""
    px = np.zeros((h, w, bpp), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        if w <= x0 or h <= y0:
            continue  # pass empty for this geometry: zero bytes
        pw = -(-(w - x0) // dx)
        ph = -(-(h - y0) // dy)
        n = ph * (pw * bpp + 1)
        sub = _unfilter(raw[pos:pos + n], ph, pw, bpp)
        pos += n
        px[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
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
    if depth != 8:
        raise NotImplementedError(f"PNG: bit depth {depth} not supported")
    if ctype not in _CHANNELS:
        raise NotImplementedError(f"PNG: color type {ctype} not supported")
    if interlace not in (0, 1):
        raise ValueError(f"PNG: unknown interlace method {interlace}")
    if comp != 0 or filt != 0:
        raise ValueError("PNG: nonstandard compression/filter method")
    bpp = _CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    if interlace == 1:
        px = _deinterlace_adam7(raw, h, w, bpp)
    else:
        px = _unfilter(raw, h, w, bpp).reshape(h, w, bpp)
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
    return plte[px[:, :, 0]]


def _filter_scanlines(arr: np.ndarray, filter_type: int) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w*3 + 1) filtered scanlines (filter byte
    prepended). Vectorizes fully for all five filters because encode
    predictors read the ORIGINAL neighbor bytes."""
    h, w, bpp = arr.shape
    cur = np.ascontiguousarray(arr).reshape(h, w * bpp)
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
    scan = np.zeros((h, w * bpp + 1), dtype=np.uint8)
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
