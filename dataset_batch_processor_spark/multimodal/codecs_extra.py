"""More pure-Python image codecs: BMP and PPM (P6).

Together with png.py these give the codec registry three REAL
interchange formats with zero third-party dependencies, so S3/K1
format-conversion paths (/root/reference/modules/other_tasks.py:29-67)
can be exercised across genuinely different containers
(decode X -> re-encode Y) rather than only roundtripping one format.

Both are full codecs (encode emits the canonical 8-bit RGB form;
decode accepts the full uncompressed depth matrix, round 8):

- BMP decode: BITMAPCOREHEADER (v2) and BITMAPINFOHEADER+ (v3/v4/v5);
  1/4/8-bit palette, 24-bit BGR, 32-bit BGRA (alpha dropped); BI_RGB
  only (RLE stays quarantined); bottom-up or top-down; rows padded
  to 4 bytes. Encode: v3 24 bpp bottom-up BI_RGB.
- PPM decode: P6 binary, any maxval 1..65535 (two-byte big-endian
  samples above 255, Netpbm), tone-mapped to 8-bit by exact integer
  rescale round((v*255)/maxval). Encode: maxval 255.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- BMP


def decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed BMP (1/4/8-bit palette, 24/32 bpp; core or info
    header) -> H x W x 3 uint8 RGB."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack("<I", content[10:14])
    (hdr_size,) = struct.unpack("<I", content[14:18])
    if hdr_size == 12:  # BITMAPCOREHEADER (OS/2 v1 / Windows v2)
        w, h_signed, _planes, bpp = struct.unpack("<hhHH", content[18:26])
        compression, n_colors_field = 0, 0
        pal_entry = 3  # BGR triples, no reserved byte
    elif hdr_size >= 40:  # BITMAPINFOHEADER and the v4/v5 extensions
        w, h_signed = struct.unpack("<ii", content[18:26])
        _planes, bpp = struct.unpack("<HH", content[26:30])
        (compression,) = struct.unpack("<I", content[30:34])
        (n_colors_field,) = struct.unpack("<I", content[46:50])
        pal_entry = 4  # BGRX quads
    else:
        raise NotImplementedError(f"BMP: header size {hdr_size} unsupported")
    if compression not in (0, 1, 2):
        raise NotImplementedError(
            f"BMP: compression {compression} unsupported "
            "(BI_RGB / BI_RLE8 / BI_RLE4 only; bitfields quarantine)"
        )
    if compression and (bpp, compression) not in ((8, 1), (4, 2)):
        raise ValueError(
            f"BMP: compression {compression} is invalid for {bpp} bpp"
        )
    if bpp not in (1, 4, 8, 24, 32):
        raise NotImplementedError(f"BMP: {bpp} bpp unsupported")
    top_down = h_signed < 0
    h = abs(h_signed)
    # dims sanity cap BEFORE any allocation (the RLE path zero-fills
    # h x w up front): same 268 MP bound as rawvendor.MAX_RAW_PIXELS
    if w <= 0 or h <= 0 or w * h > 1 << 28:
        raise ValueError(
            f"BMP: implausible dims {w}x{h_signed} (corrupt header)"
        )
    if compression:  # RLE is bottom-up by spec
        if top_down:
            raise ValueError("BMP: RLE bitmaps cannot be top-down")
        n_colors = n_colors_field or (1 << bpp)
        pal = (
            np.frombuffer(
                content, dtype=np.uint8, count=n_colors * pal_entry,
                offset=14 + hdr_size,
            )
            .reshape(n_colors, pal_entry)[:, 2::-1]
        )
        idx = _decode_bmp_rle(content[data_offset:], w, h, bpp)
        px = np.take(pal, idx, axis=0, mode="clip")
        return np.ascontiguousarray(px[::-1])
    stride = ((w * bpp + 31) // 32) * 4  # rows padded to 4 bytes
    rows = np.frombuffer(
        content, dtype=np.uint8, count=h * stride, offset=data_offset
    ).reshape(h, stride)
    if bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    elif bpp == 32:
        px = rows[:, : w * 4].reshape(h, w, 4)[:, :, 2::-1]  # BGRA -> RGB
    else:  # palette depths
        n_colors = n_colors_field or (1 << bpp)
        pal = (
            np.frombuffer(
                content, dtype=np.uint8, count=n_colors * pal_entry,
                offset=14 + hdr_size,
            )
            .reshape(n_colors, pal_entry)[:, 2::-1]  # BGR(X) -> RGB
        )
        if bpp == 8:
            idx = rows[:, :w]
        elif bpp == 4:
            nib = np.empty((h, stride * 2), dtype=np.uint8)
            nib[:, 0::2] = rows >> 4  # high nibble = left pixel
            nib[:, 1::2] = rows & 0x0F
            idx = nib[:, :w]
        else:  # 1 bpp, MSB-first
            idx = np.unpackbits(rows, axis=1)[:, :w]
        px = np.take(pal, idx, axis=0, mode="clip")
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px)


def encode_bmp(arr: np.ndarray) -> bytes:
    """H x W x 3 uint8 RGB -> 24-bit bottom-up BI_RGB BMP."""
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects H x W x 3 uint8")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB->BGR
    data = rows.tobytes()
    file_size = 54 + len(data)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return b"BM" + struct.pack("<IHHI", file_size, 0, 0, 54) + info + data


def _decode_bmp_rle(data: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """BI_RLE8 / BI_RLE4 stream -> H x W uint8 palette indices in
    STORAGE order (bottom row first; the caller flips). Pixels skipped
    by delta moves or an early end-of-line/bitmap stay 0, the
    conventional 'transparent fill'. Escapes: 0=end-of-line,
    1=end-of-bitmap, 2=delta(dx,dy), n>=3=absolute run (word-aligned);
    RLE4 runs alternate the byte's high/low nibbles."""
    idx = np.zeros((h, w), dtype=np.uint8)
    x = y = i = 0
    n_bytes = len(data)
    while i + 1 < n_bytes and y < h:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            if bpp == 8:
                vals = [val] * cnt
            else:
                hi, lo = val >> 4, val & 0x0F
                vals = [(hi, lo)[k & 1] for k in range(cnt)]
            take = min(cnt, w - x)
            if take > 0:
                idx[y, x : x + take] = vals[:take]
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if i + 1 >= n_bytes:
                break
            x += data[i]
            y += data[i + 1]
            i += 2
        else:  # absolute mode, `val` literal pixels, word-aligned
            n = val
            if bpp == 8:
                vals = list(data[i : i + n])
                i += n + (n & 1)
            else:
                nb = (n + 1) // 2
                raw = data[i : i + nb]
                i += nb + (nb & 1)
                vals = [v for b in raw for v in (b >> 4, b & 0x0F)][:n]
            take = min(len(vals), max(0, w - x))
            if take > 0:
                idx[y, x : x + take] = vals[:take]
            x += n
    return idx


def encode_bmp_rle(
    idx: np.ndarray, palette: np.ndarray, bpp: int = 8
) -> bytes:
    """H x W palette indices -> BI_RLE8 (bpp=8) or BI_RLE4 (bpp=4)
    BMP. RLE8 emits maximal runs; RLE4 emits nibble-pair runs — both
    canonical streams the decoder inverts exactly (the escape-code
    edge cases are pinned by hand-built streams in the tests)."""
    if bpp not in (8, 4):
        raise ValueError("RLE BMPs are 8 or 4 bpp")
    h, w = idx.shape
    out = bytearray()
    for row in idx[::-1]:  # bottom-up storage
        if bpp == 8:
            x = 0
            while x < w:
                run = 1
                while x + run < w and row[x + run] == row[x] and run < 255:
                    run += 1
                out += bytes((run, int(row[x])))
                x += run
        else:
            for x in range(0, w, 2):
                if x + 1 < w:
                    out += bytes(
                        (2, (int(row[x]) << 4) | int(row[x + 1]))
                    )
                else:
                    out += bytes((1, int(row[x]) << 4))
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    pal_arr = np.zeros((len(palette), 4), dtype=np.uint8)
    pal_arr[:, :3] = np.asarray(palette, dtype=np.uint8)[:, ::-1]
    pal = pal_arr.tobytes()
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 1 if bpp == 8 else 2,
        len(out), 2835, 2835, len(palette), 0,
    )
    data_offset = 14 + 40 + len(pal)
    head = b"BM" + struct.pack(
        "<IHHI", data_offset + len(out), 0, 0, data_offset
    )
    return head + info + pal + bytes(out)


def encode_bmp_ex(
    arr: np.ndarray,
    bpp: int = 24,
    palette: np.ndarray | None = None,
    core: bool = False,
    top_down: bool = False,
) -> bytes:
    """Extended BMP encoder covering the decoder's full depth matrix
    (round 8): 1/4/8 bpp palette (``arr`` = H x W indices, ``palette``
    = N x 3 RGB), 24 bpp (H x W x 3 RGB), 32 bpp (H x W x 4 RGBA).
    ``core`` emits the 12-byte BITMAPCOREHEADER (3-byte palette
    entries); ``top_down`` stores rows in image order with negative
    height (info header only — the core header has no sign
    convention)."""
    if core and top_down:
        raise ValueError("core header BMPs are bottom-up only")
    if bpp in (1, 4, 8):
        if palette is None or arr.ndim != 2:
            raise ValueError("palette depths need H x W indices + palette")
        h, w = arr.shape
        if bpp == 8:
            packed = arr.astype(np.uint8)
        elif bpp == 4:
            padded = np.zeros((h, w + w % 2), dtype=np.uint8)
            padded[:, :w] = arr
            packed = (padded[:, 0::2] << 4) | padded[:, 1::2]
        else:
            packed = np.packbits(arr.astype(np.uint8), axis=1)
        entry = 3 if core else 4
        pal_arr = np.zeros((len(palette), entry), dtype=np.uint8)
        pal_arr[:, :3] = np.asarray(palette, dtype=np.uint8)[:, ::-1]
        pal = pal_arr.tobytes()
    elif bpp == 24:
        if arr.ndim != 3 or arr.shape[2] != 3:
            raise ValueError("24 bpp needs H x W x 3 RGB")
        h, w = arr.shape[:2]
        packed = arr[:, :, ::-1].reshape(h, w * 3)
        pal = b""
    elif bpp == 32:
        if arr.ndim != 3 or arr.shape[2] != 4:
            raise ValueError("32 bpp needs H x W x 4 RGBA")
        h, w = arr.shape[:2]
        packed = arr[:, :, [2, 1, 0, 3]].reshape(h, w * 4)
        pal = b""
    else:
        raise ValueError(f"unsupported bpp {bpp}")
    stride = ((w * bpp + 31) // 32) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : packed.shape[1]] = packed
    if not top_down:
        rows = rows[::-1]
    h_field = -h if top_down else h
    if core:
        info = struct.pack("<IhhHH", 12, w, h_field, 1, bpp)
    else:
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h_field, 1, bpp, 0, rows.size,
            2835, 2835, 0, 0,
        )
    data_offset = 14 + len(info) + len(pal)
    head = b"BM" + struct.pack(
        "<IHHI", data_offset + rows.size, 0, 0, data_offset
    )
    return head + info + pal + rows.tobytes()


# ----------------------------------------------------------------- PPM


def decode_ppm(content: bytes) -> np.ndarray:
    """Binary P6 PPM (any maxval 1..65535) -> H x W x 3 uint8 RGB.

    Netpbm stores one byte per sample for maxval <= 255 and two
    big-endian bytes above; display mapping is the exact integer
    rescale round(v*255/maxval) (identity at 255)."""
    if content[:2] != b"P6":
        raise ValueError("not a binary PPM payload")
    # header: P6 <w> <h> <maxval> with comments (#...) and whitespace
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if w <= 0 or h <= 0 or w * h > 1 << 28:
        raise ValueError(f"PPM: implausible dims {w}x{h} (corrupt header)")
    if not 1 <= maxval <= 65535:
        raise ValueError(f"PPM: maxval {maxval} out of spec range")
    if maxval == 255:
        return (
            np.frombuffer(content, dtype=np.uint8, count=h * w * 3, offset=pos)
            .reshape(h, w, 3)
            .copy()
        )
    dtype = ">u2" if maxval > 255 else np.uint8
    vals = np.frombuffer(content, dtype=dtype, count=h * w * 3, offset=pos)
    scaled = (vals.astype(np.uint32) * 255 + maxval // 2) // maxval
    return scaled.astype(np.uint8).reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    """H x W x 3 uint8 RGB -> binary P6 PPM."""
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_ppm expects H x W x 3 uint8")
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + np.ascontiguousarray(arr).tobytes()
