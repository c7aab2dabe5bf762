"""Pure-Python GIF first-frame decoder (LZW, stdlib-only + numpy).

S5 parity: the reference takes the FIRST frame of animated images and
re-saves it (/root/reference/modules/batch_processor.py:352-357 via
PIL ``im.seek(0)``); this decoder implements exactly that surface —
parse the stream up to the first image descriptor, LZW-decompress it,
resolve the (local or global) palette, de-interlace if flagged, and
return H x W x 3 uint8 RGB. Later frames, disposal, and transparency
compositing are out of scope by design (the reference never reads
them either).

Decode-only: the reference re-saves first frames INTO other formats
(JPEG/PNG), never writes GIF — encode lives in png/bmp/ppm.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW -> array of palette indices (uint8)."""
    clear_code = 1 << min_code_size
    end_code = clear_code + 1
    # bit reader over the concatenated sub-block payload
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    code_size = min_code_size + 1
    next_code = end_code + 1
    # dict: code -> bytes; initial codes are single palette indices
    table: list[bytes] = [bytes([i]) for i in range(clear_code)] + [b"", b""]
    prev: bytes | None = None
    acc = 0
    acc_bits = 0
    pos = 0
    while True:
        while acc_bits < code_size:
            if pos >= len(data):
                return out[:n_out] if n_out < n_pixels else out
            acc |= data[pos] << acc_bits
            acc_bits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        acc_bits -= code_size
        if code == clear_code:
            table = [bytes([i]) for i in range(clear_code)] + [b"", b""]
            code_size = min_code_size + 1
            next_code = end_code + 1
            prev = None
            continue
        if code == end_code:
            # Mirror the data-starvation path: an end_code before w*h
            # pixels were emitted is a truncated stream, and returning
            # the full uninitialized buffer would defeat decode_gif's
            # len(idx) < w*h check (garbage pixels / palette IndexError
            # instead of the ValueError->quarantine contract).
            return out[:n_out] if n_out < n_pixels else out
        if code < len(table) and (code <= end_code or table[code]):
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"GIF: bad LZW code {code}")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if n_out >= n_pixels:
            return out
        if prev is not None:
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """Undo GIF 4-pass interlacing (rows 0::8, 4::8, 2::4, 1::2)."""
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        rows = range(start, h, step)
        out[list(rows)] = idx[src : src + len(rows)]
        src += len(rows)
    return out


def decode_gif(content: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a stream -> H x W x 3 uint8 RGB."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    global_palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_palette = np.frombuffer(
            content, dtype=np.uint8, count=n * 3, offset=pos
        ).reshape(n, 3)
        pos += n * 3
    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF: no image data")
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while content[pos]:
                pos += 1 + content[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{block:02x}")
        # image descriptor
        _x, _y, w, h, iflags = struct.unpack("<HHHHB", content[pos : pos + 9])
        pos += 9
        palette = global_palette
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            palette = np.frombuffer(
                content, dtype=np.uint8, count=n * 3, offset=pos
            ).reshape(n, 3)
            pos += n * 3
        if palette is None:
            raise ValueError("GIF: image without any color table")
        min_code_size = content[pos]
        pos += 1
        chunks = []
        while content[pos]:
            ln = content[pos]
            chunks.append(content[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        idx = _lzw_decode(min_code_size, b"".join(chunks), w * h)
        if len(idx) < w * h:  # tolerate truncated streams like PIL does not
            raise ValueError("GIF: truncated image data")
        grid = idx.reshape(h, w)
        if iflags & 0x40:
            grid = _deinterlace(grid)
        return palette[grid]
    raise ValueError("GIF: no image data")
