"""Pure-Python TIFF codec (uncompressed baseline) + DNG probe.

S4 adjacency: camera RAW formats (DNG explicitly, and CR2/NEF/ARW
structurally) are TIFF containers — IFD tag trees around strip/tile
pixel data. Full RAW development (CFA demosaic, vendor compression)
stays library-bound and stubbed, but the CONTAINER layer is plain
public TIFF 6.0, implemented here:

- decode: classic little/big-endian TIFF, first IFD, uncompressed
  (Compression=1) strips, 8-bit RGB / RGBA (alpha dropped) / gray
  (replicated), PlanarConfiguration=1. LZW/JPEG-compressed TIFFs and
  16-bit raise NotImplementedError into the F7 quarantine.
- encode: single-strip uncompressed 8-bit RGB, little-endian.
- ``probe_tiff_dims``: header-only width/height/compression from the
  IFD — works on uncompressed AND compressed TIFF/DNG alike (the S2
  header-probe story extended to the RAW container family).
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
               11: 4, 12: 8}


def _read_ifd(content: bytes, bo: str):
    """-> dict tag -> list of values (first IFD only)."""
    (off,) = struct.unpack(bo + "I", content[4:8])
    (n,) = struct.unpack(bo + "H", content[off : off + 2])
    tags = {}
    for i in range(n):
        e = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(bo + "HHI", content[e : e + 8])
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size <= 4:
            raw = content[e + 8 : e + 8 + size]
        else:
            (voff,) = struct.unpack(bo + "I", content[e + 8 : e + 12])
            raw = content[voff : voff + size]
        if typ == 3:
            vals = list(struct.unpack(bo + "H" * cnt, raw))
        elif typ == 4:
            vals = list(struct.unpack(bo + "I" * cnt, raw))
        elif typ == 1:
            vals = list(raw)
        else:
            vals = [raw]
        tags[tag] = vals
    return tags


def _parse_header(content: bytes):
    if content[:2] == b"II" and content[2:4] == b"*\x00":
        return "<"
    if content[:2] == b"MM" and content[2:4] == b"\x00*":
        return ">"
    raise ValueError("not a TIFF payload")


def probe_tiff_dims(content: bytes) -> tuple[int, int]:
    """(width, height) from the first IFD — no pixel decode, works on
    compressed TIFF/DNG/CR2-class containers too."""
    bo = _parse_header(content)
    tags = _read_ifd(content, bo)
    return int(tags[256][0]), int(tags[257][0])


def decode_tiff(content: bytes) -> np.ndarray:
    """Uncompressed 8-bit TIFF -> H x W x 3 uint8 RGB."""
    bo = _parse_header(content)
    tags = _read_ifd(content, bo)
    w, h = int(tags[256][0]), int(tags[257][0])
    compression = int(tags.get(259, [1])[0])
    if compression != 1:
        raise NotImplementedError(
            f"TIFF: compression {compression} requires a codec library "
            "(only uncompressed supported)"
        )
    bits = tags.get(258, [8])
    if any(int(b) != 8 for b in bits if isinstance(b, int)):
        raise NotImplementedError("TIFF: only 8-bit samples supported")
    spp = int(tags.get(277, [len(bits)])[0])
    planar = int(tags.get(284, [1])[0])
    if planar != 1:
        raise NotImplementedError("TIFF: planar configuration 2 unsupported")
    offsets = tags[273]
    counts = tags[279]
    rows_per_strip = int(tags.get(278, [h])[0])
    data = b"".join(
        content[int(o) : int(o) + int(c)] for o, c in zip(offsets, counts)
    )
    del rows_per_strip  # strips are contiguous once concatenated
    px = np.frombuffer(data, dtype=np.uint8, count=h * w * spp).reshape(
        h, w, spp
    )
    if spp == 1:
        return np.repeat(px, 3, axis=2)
    if spp >= 4:
        return np.ascontiguousarray(px[:, :, :3])
    if spp == 3:
        return px.copy()
    raise NotImplementedError(f"TIFF: {spp} samples per pixel unsupported")


def encode_tiff(arr: np.ndarray) -> bytes:
    """H x W x 3 (or gray) uint8 -> single-strip uncompressed TIFF."""
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_tiff expects H x W x 3 uint8")
    h, w, _ = arr.shape
    pixel_data = np.ascontiguousarray(arr).tobytes()
    entries = []  # (tag, type, count, value_or_offset)
    n_entries = 8
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_entries + 4
    bits_off = data_off
    strip_off = bits_off + 6  # three SHORTs for BitsPerSample
    entries.append((256, 4, 1, w))
    entries.append((257, 4, 1, h))
    entries.append((258, 3, 3, bits_off))
    entries.append((259, 3, 1, 1))  # uncompressed
    entries.append((262, 3, 1, 2))  # RGB photometric
    entries.append((273, 4, 1, strip_off))
    entries.append((277, 3, 1, 3))
    entries.append((279, 4, 1, len(pixel_data)))
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", ifd_off)
    out += struct.pack("<H", n_entries)
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # next IFD
    out += struct.pack("<HHH", 8, 8, 8)
    out += pixel_data
    return bytes(out)
