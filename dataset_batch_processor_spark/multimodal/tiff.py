"""Pure-Python TIFF codec (uncompressed baseline) + DNG probe.

S4 adjacency: camera RAW formats (DNG explicitly, and CR2/NEF/ARW
structurally) are TIFF containers — IFD tag trees around strip/tile
pixel data. Full RAW development (CFA demosaic, vendor compression)
stays library-bound and stubbed, but the CONTAINER layer is plain
public TIFF 6.0, implemented here:

- decode: classic little/big-endian TIFF, first IFD, uncompressed
  (Compression=1) strips, 8- or 16-bit (top-byte tone map) RGB /
  RGBA (alpha dropped) / gray (replicated), chunky OR separate-plane
  (PlanarConfiguration 1/2) layout. LZW/JPEG-compressed TIFFs raise
  NotImplementedError into the F7 quarantine.
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


def _read_ifd_at(content: bytes, bo: str, off: int):
    """IFD at ``off`` -> (dict tag -> list of values, next-IFD offset).
    The offset form is what the RAW container family needs: CR2 points
    at its raw IFD from the header, NEF reaches it through SubIFDs
    (tag 330)."""
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
    (nxt,) = struct.unpack(
        bo + "I", content[off + 2 + 12 * n : off + 6 + 12 * n]
    )
    return tags, nxt


def _read_ifd(content: bytes, bo: str):
    """-> dict tag -> list of values (first IFD only)."""
    (off,) = struct.unpack(bo + "I", content[4:8])
    return _read_ifd_at(content, bo, off)[0]


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
    """Uncompressed 8/16-bit TIFF -> H x W x 3 uint8 RGB (16-bit
    samples follow the file byte order and tone-map to the top byte —
    the DNG/NEF display policy; round 8)."""
    bo = _parse_header(content)
    tags = _read_ifd(content, bo)
    w, h = int(tags[256][0]), int(tags[257][0])
    compression = int(tags.get(259, [1])[0])
    if compression != 1:
        raise NotImplementedError(
            f"TIFF: compression {compression} requires a codec library "
            "(only uncompressed supported)"
        )
    bits = [int(b) for b in tags.get(258, [8]) if isinstance(b, int)]
    depth = bits[0] if bits else 8
    if depth not in (8, 16) or any(b != depth for b in bits):
        raise NotImplementedError(
            f"TIFF: {tags.get(258)}-bit samples unsupported "
            "(8 or 16, uniform across channels)"
        )
    spp = int(tags.get(277, [max(1, len(bits))])[0])
    planar = int(tags.get(284, [1])[0])
    if planar not in (1, 2):
        raise NotImplementedError(
            f"TIFF: planar configuration {planar} unsupported"
        )
    offsets = tags[273]
    counts = tags[279]
    rows_per_strip = int(tags.get(278, [h])[0])
    data = b"".join(
        content[int(o) : int(o) + int(c)] for o, c in zip(offsets, counts)
    )
    # Strips are contiguous once concatenated in tag order: chunky
    # (planar=1) rows interleave samples; separate planes (planar=2)
    # list ALL strips of sample 0 first, then sample 1, ... (TIFF 6.0
    # p.68), so the concatenation is plane-major.
    del rows_per_strip
    if depth == 16:
        vals = np.frombuffer(data, dtype=bo + "u2", count=h * w * spp)
        vals = (
            vals.reshape(spp, h, w).transpose(1, 2, 0)
            if planar == 2
            else vals.reshape(h, w, spp)
        )
        px = (vals >> 8).astype(np.uint8)
    else:
        raw = np.frombuffer(data, dtype=np.uint8, count=h * w * spp)
        px = (
            raw.reshape(spp, h, w).transpose(1, 2, 0)
            if planar == 2
            else raw.reshape(h, w, spp)
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


# ------------------------------------------------ DNG (lossless JPEG)
# DNG's standard compression (tag 259 = 7, "new-style JPEG") wraps an
# ITU T.81 SOF3 lossless-JPEG stream per strip/tile; the entropy layer
# lives in multimodal/ljpeg.py. This closes the bare-install RAW gap
# for lossless-JPEG DNGs: the container below is the same public TIFF
# 6.0 IFD machinery as above, with the DNGVersion tag so readers
# recognize the file.


def encode_dng_lossless(
    arr: np.ndarray, predictor: int = 1, orientation: int = 1,
    tile: tuple[int, int] | None = None,
) -> bytes:
    """(H, W) or (H, W, C) uint16 -> minimal lossless-JPEG DNG
    (little-endian TIFF, Compression=7). ``orientation`` writes EXIF
    tag 274 (1..8) when not the default.

    Layout: one strip by default; ``tile=(tile_width, tile_length)``
    writes the TILED layout real cameras ship (tags 322/323/324/325,
    TIFF 6.0 §15) — every tile is its own full-size SOF3 stream, edge
    tiles padded by edge replication (the decoder clips), tile dims
    multiples of 16 per the spec."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint16 or arr.ndim != 3:
        raise ValueError("encode_dng_lossless expects (H, W[, C]) uint16")
    if not 1 <= orientation <= 8:
        raise ValueError("orientation must be 1..8")
    from . import ljpeg

    h, w, nc = arr.shape
    if tile is None:
        streams = [ljpeg.encode_ljpeg(arr, precision=16, predictor=predictor)]
    else:
        tw, tl = tile
        if tw <= 0 or tl <= 0 or tw % 16 or tl % 16:
            raise ValueError("tile dims must be positive multiples of 16")
        across = -(-w // tw)
        down = -(-h // tl)
        padded = np.pad(
            arr, ((0, down * tl - h), (0, across * tw - w), (0, 0)),
            mode="edge",
        )
        streams = [
            ljpeg.encode_ljpeg(
                padded[ty * tl:(ty + 1) * tl, tx * tw:(tx + 1) * tw],
                precision=16, predictor=predictor,
            )
            for ty in range(down)
            for tx in range(across)
        ]
    # PhotometricInterpretation: 34892 = LinearRaw (public DNG spec);
    # 1-component mosaics would use 32803 (CFA) + pattern tags, which
    # need camera metadata we don't model — LinearRaw keeps the file
    # self-describing.
    nt = len(streams)
    entries = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, nc, None),        # value patched below
        (259, 3, 1, 7),            # Compression = new-style JPEG
        (262, 3, 1, 34892),        # LinearRaw
        (277, 3, 1, nc),           # SamplesPerPixel
        (50706, 1, 4, 0x00000401), # DNGVersion 1.4.0.0 (LE bytes)
    ]
    if tile is None:
        entries.append((273, 4, 1, None))             # StripOffsets
        entries.append((279, 4, 1, len(streams[0])))  # StripByteCounts
    else:
        entries.append((322, 4, 1, tw))   # TileWidth
        entries.append((323, 4, 1, tl))   # TileLength
        entries.append((324, 4, nt, None))  # TileOffsets
        entries.append((325, 4, nt, None))  # TileByteCounts
    if orientation != 1:
        entries.append((274, 3, 1, orientation))
    entries.sort(key=lambda e: e[0])
    n_entries = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_entries + 4
    bits_off = data_off
    pos = data_off + (2 * nc if nc > 2 else 0)  # out-of-line BitsPerSample
    if nc <= 2:
        bits_val = 16 if nc == 1 else (16 | (16 << 16))
    else:
        bits_val = bits_off
    # out-of-line LONG arrays for tile offsets/counts when nt > 1
    off_arr_off = cnt_arr_off = 0
    if tile is not None and nt > 1:
        off_arr_off = pos
        pos += 4 * nt
        cnt_arr_off = pos
        pos += 4 * nt
    stream_offs = []
    for s in streams:
        stream_offs.append(pos)
        pos += len(s)
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", ifd_off)
    out += struct.pack("<H", n_entries)
    for tag, typ, cnt, val in entries:
        if tag == 258:
            val = bits_val
        elif tag in (273, 324):
            val = stream_offs[0] if nt == 1 else off_arr_off
        elif tag == 325:
            val = len(streams[0]) if nt == 1 else cnt_arr_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    if nc > 2:
        out += struct.pack("<" + "H" * nc, *([16] * nc))
    if tile is not None and nt > 1:
        out += struct.pack("<" + "I" * nt, *stream_offs)
        out += struct.pack("<" + "I" * nt, *[len(s) for s in streams])
    for s in streams:
        out += s
    return bytes(out)


def probe_tiff_orientation(content: bytes) -> int:
    """EXIF Orientation (tag 274) from the first IFD, header-only —
    the S2 probe family extended to the rotate/mirror metadata every
    photo pipeline must honor before geometry math. 1 (top-left) when
    absent, per the TIFF 6.0 default."""
    bo = _parse_header(content)
    tags = _read_ifd(content, bo)
    return int(tags.get(274, [1])[0])


def apply_exif_orientation(arr: np.ndarray, orientation: int) -> np.ndarray:
    """Re-lay pixels so the result is upright (EXIF 274 semantics,
    public TIFF/EXIF spec): 1 identity, 2 mirror-H, 3 rotate 180,
    4 mirror-V, 5 transpose, 6 rotate 90 CW, 7 transverse,
    8 rotate 270 CW. Orientations 5-8 swap the output dimensions."""
    if orientation == 1:
        return arr
    if orientation == 2:
        return arr[:, ::-1]
    if orientation == 3:
        return arr[::-1, ::-1]
    if orientation == 4:
        return arr[::-1, :]
    if orientation == 5:
        return np.swapaxes(arr, 0, 1)
    if orientation == 6:
        return np.swapaxes(arr, 0, 1)[:, ::-1]
    if orientation == 7:
        return np.swapaxes(arr, 0, 1)[::-1, ::-1]
    if orientation == 8:
        return np.swapaxes(arr, 0, 1)[::-1, :]
    raise ValueError("orientation must be 1..8")


def decode_dng_lossless(content: bytes) -> np.ndarray:
    """Lossless-JPEG (Compression=7) TIFF/DNG -> (H, W, C) uint16.

    Both layouts real DNGs ship: STRIPS (each strip its own SOF3
    stream, stacked in row order) and TILES (tags 322/323/324/325,
    TIFF 6.0 §15 — row-major full-size tiles, edge tiles clipped).
    Vendor-sliced RAW (CR2 sensor slices, NEF linearization) still
    quarantines with a precise reason."""
    from . import ljpeg

    bo = _parse_header(content)
    tags = _read_ifd(content, bo)
    w, h = int(tags[256][0]), int(tags[257][0])
    compression = int(tags.get(259, [1])[0])
    if compression != 7:
        raise NotImplementedError(
            f"DNG: compression {compression} is not lossless JPEG"
        )
    if 322 in tags or 324 in tags:
        if 322 not in tags or 323 not in tags or 324 not in tags \
                or 325 not in tags:
            raise ValueError("DNG: incomplete tile tag set")
        tw, tl = int(tags[322][0]), int(tags[323][0])
        if tw <= 0 or tl <= 0:
            raise ValueError("DNG: invalid tile dimensions")
        offsets, counts = tags[324], tags[325]
        across = -(-w // tw)
        down = -(-h // tl)
        if len(offsets) != across * down or len(counts) != len(offsets):
            raise ValueError("DNG: tile count mismatch")
        canvas = None
        for idx, (o, c) in enumerate(zip(offsets, counts)):
            seg = ljpeg.decode_ljpeg(content[int(o) : int(o) + int(c)])
            if seg.shape[0] != tl or seg.shape[1] != tw:
                raise ValueError("DNG: tile geometry mismatch")
            if canvas is None:
                canvas = np.zeros(
                    (down * tl, across * tw, seg.shape[2]), dtype=np.uint16
                )
            ty, tx = divmod(idx, across)
            canvas[ty * tl:(ty + 1) * tl, tx * tw:(tx + 1) * tw] = seg
        return np.ascontiguousarray(canvas[:h, :w])
    offsets = tags[273]
    counts = tags[279]
    parts = []
    rows = 0
    for o, c in zip(offsets, counts):
        seg = ljpeg.decode_ljpeg(content[int(o) : int(o) + int(c)])
        if seg.shape[1] != w:
            raise ValueError("DNG: strip width mismatch")
        rows += seg.shape[0]
        parts.append(seg)
    arr = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)
    if rows != h or arr.shape[0] != h:
        raise ValueError("DNG: strip rows do not cover the image")
    return arr


def decode_dng_display(content: bytes) -> np.ndarray:
    """Registry adapter for the .dng key: uncompressed 8-bit DNGs
    take the plain TIFF path; lossless-JPEG (Compression=7) DNGs
    decode through ljpeg and tone-map 16-bit linear to 8-bit display
    (top byte — the standard linear preview), gray replicated to RGB.
    Everything else still quarantines with its precise reason."""
    bo = _parse_header(content)
    tags = _read_ifd(content, bo)
    compression = int(tags.get(259, [1])[0])
    if compression == 1:
        return decode_tiff(content)
    arr = decode_dng_lossless(content)  # raises for non-7 compression
    disp = (arr >> 8).astype(np.uint8)
    if disp.shape[2] == 1:
        return np.repeat(disp, 3, axis=2)
    if disp.shape[2] >= 3:
        return np.ascontiguousarray(disp[:, :, :3])
    return np.repeat(disp[:, :, :1], 3, axis=2)
