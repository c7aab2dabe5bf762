"""More pure-Python image codecs: BMP (24-bit) and PPM (P6).

Together with png.py these give the codec registry three REAL
interchange formats with zero third-party dependencies, so S3/K1
format-conversion paths (/root/reference/modules/other_tasks.py:29-67)
can be exercised across genuinely different containers
(decode X -> re-encode Y) rather than only roundtripping one format.

Both are full codecs (decode + encode), 8-bit RGB:

- BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 24 bpp, BI_RGB
  (uncompressed), bottom-up, BGR byte order, rows padded to 4 bytes.
- PPM: P6 binary, maxval 255 (Netpbm).
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- BMP


def decode_bmp(content: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP -> H x W x 3 uint8 RGB."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack("<I", content[10:14])
    (hdr_size,) = struct.unpack("<I", content[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BMP: only BITMAPINFOHEADER (v3+) supported")
    w, h_signed = struct.unpack("<ii", content[18:26])
    planes, bpp = struct.unpack("<HH", content[26:30])
    (compression,) = struct.unpack("<I", content[30:34])
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP: only 24-bit uncompressed supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h_signed < 0
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    px = np.frombuffer(
        content, dtype=np.uint8, count=h * stride, offset=data_offset
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px[:, :, ::-1])  # BGR -> RGB


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


# ----------------------------------------------------------------- PPM


def decode_ppm(content: bytes) -> np.ndarray:
    """Binary P6 PPM (maxval 255) -> H x W x 3 uint8 RGB."""
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
    if maxval != 255:
        raise NotImplementedError(f"PPM: maxval {maxval} not supported")
    return (
        np.frombuffer(content, dtype=np.uint8, count=h * w * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def encode_ppm(arr: np.ndarray) -> bytes:
    """H x W x 3 uint8 RGB -> binary P6 PPM."""
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_ppm expects H x W x 3 uint8")
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + np.ascontiguousarray(arr).tobytes()
