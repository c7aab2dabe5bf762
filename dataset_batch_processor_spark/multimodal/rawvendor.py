"""Pure-Python CR2/NEF container layer over the SOF3 entropy codec.

Closes the last S4 gap on a bare install (VERDICT r6 next#1): the
reference decodes vendor RAW via ``imageio.v3.imread``
(/root/reference/modules/other_tasks.py:45-51; extension list
filter_crop.py:39). The ENTROPY layer already exists —
multimodal/ljpeg.py is a complete T.81 SOF3 codec, and Canon/Nikon
lossless modes are SOF3 streams — so what remained was the vendor
CONTAINER walk, implemented here from public format knowledge (TIFF
6.0 / TIFF-EP structure; the CR2 slice arithmetic is documented in
the public dcraw/LibRaw lineage and Lossless-JPEG notes):

- **CR2** (Canon RAW 2): a TIFF file whose header carries a ``CR``
  magic at offset 8 and, at offset 12, a direct pointer to the RAW
  IFD (the last IFD in real files). The RAW IFD stores one SOF3
  stream (Compression = 6 "old JPEG" in real cameras; 7 accepted
  too) plus tag 0xC640 (50752) ``cr2_slice = [n_full, w_full,
  w_last]``: the sensor is stored as vertical SLICES, the SOF3
  stream's samples filling slice 0 completely (all rows), then
  slice 1, ... Unslicing is therefore pure reshaping: consecutive
  ``h x w_s`` sample blocks land at consecutive column offsets.
- **NEF** (Nikon): plain TIFF-EP — IFD0 describes a preview and
  points at the RAW IFD through tag 330 (SubIFDs). Uncompressed
  NEFs pack samples big-endian at 12/14/16 bits per sample
  (Compression = 1); Nikon's entropy-coded variant
  (Compression = 34713) needs MakerNote Huffman trees + a
  linearization curve and stays quarantined with a precise reason
  (rawpy auto-wires over this module when installed —
  optional_codecs.try_register_optional_codecs).

Both decoders return the (H, W) uint16 SENSOR GRID (CFA mosaic
semantics — demosaic is a downstream choice, not a container
property). Display adapters tone-map the top byte like the DNG path.

Encoders exist so the roundtrip queries and tests can gate the decode
bit-exactly on self-produced bytes — the same pattern that proved the
DNG path (mm_dng_lossless_roundtrip).
"""

from __future__ import annotations

import struct

import numpy as np

from . import ljpeg
from .tiff import _parse_header, _read_ifd_at

CR2_SLICE_TAG = 0xC640  # 50752

# Dims sanity cap for header-declared sizes: a corrupt/malicious
# container claiming a multi-gigapixel sensor would otherwise
# allocate executor memory BEFORE the quarantine's try/except could
# matter. 2^28 pixels (268 MP, 512 MB as uint16) is ~2.5x the
# largest real sensor.
MAX_RAW_PIXELS = 1 << 28


def _check_dims(w: int, h: int, fmt: str) -> None:
    if w <= 0 or h <= 0 or w * h > MAX_RAW_PIXELS:
        raise ValueError(
            f"{fmt}: implausible sensor dims {w}x{h} (corrupt header)"
        )


# --------------------------------------------------------------- CR2


def _slice_widths(n_full: int, w_full: int, w_last: int) -> list[int]:
    return [w_full] * n_full + [w_last]


def encode_cr2_lossless(
    arr: np.ndarray, n_slices: int = 3, ncomp: int = 2, predictor: int = 1,
    restart_rows: int = 0,
) -> bytes:
    """(H, W) uint16 sensor grid -> minimal sliced CR2.

    The sensor is split into ``n_slices`` vertical slices (equal
    widths except the last, Canon-style); samples are serialized
    slice-major and entropy-coded as ONE SOF3 stream of
    ``ncomp`` interleaved components (real CR2s use 2 or 4).
    ``restart_rows`` forwards to the SOF3 encoder (row-aligned DRI —
    some Canon bodies emit restart markers)."""
    if arr.ndim != 2 or arr.dtype != np.uint16:
        raise ValueError("encode_cr2_lossless expects (H, W) uint16")
    h, w = arr.shape
    if n_slices < 1:
        raise ValueError("n_slices must be >= 1")
    if w % ncomp:
        raise ValueError("sensor width must be divisible by ncomp")
    # Canon-style widths: n_full full slices + remainder last slice.
    # Each slice width must leave the total stream reshapeable to
    # (h, w/ncomp, ncomp); serialization is sample-order so only the
    # TOTAL must divide — any positive split works.
    n_full = n_slices - 1
    w_full = (w // n_slices) if n_slices > 1 else w
    if n_full and w_full == 0:
        raise ValueError("too many slices for this width")
    w_last = w - n_full * w_full
    widths = _slice_widths(n_full, w_full, w_last)
    flat = np.concatenate(
        [
            arr[:, off : off + ws].reshape(-1)
            for off, ws in zip(np.cumsum([0] + widths[:-1]), widths)
        ]
    )
    sof_in = flat.reshape(h, w // ncomp, ncomp)
    stream = ljpeg.encode_ljpeg(
        sof_in, precision=16, predictor=predictor,
        restart_rows=restart_rows,
    )

    raw_entries = [
        (256, 4, 1, w),            # sensor width (informational)
        (257, 4, 1, h),
        (259, 3, 1, 6),            # Compression: old JPEG (Canon)
        (273, 4, 1, None),         # StripOffsets patched below
        (279, 4, 1, len(stream)),
        (CR2_SLICE_TAG, 3, 3, None),  # [n_full, w_full, w_last]
    ]
    # layout: header(16) | IFD0 | raw IFD | slice-tag shorts | stream
    ifd0_off = 16
    ifd0_entries = [(256, 4, 1, w), (257, 4, 1, h)]
    raw_ifd_off = ifd0_off + 2 + 12 * len(ifd0_entries) + 4
    slice_vals_off = raw_ifd_off + 2 + 12 * len(raw_entries) + 4
    stream_off = slice_vals_off + 6
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", ifd0_off)
    out += b"CR" + bytes([2, 0])
    out += struct.pack("<I", raw_ifd_off)
    out += struct.pack("<H", len(ifd0_entries))
    for tag, typ, cnt, val in ifd0_entries:
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += struct.pack("<H", len(raw_entries))
    for tag, typ, cnt, val in raw_entries:
        if tag == 273:
            val = stream_off
        elif tag == CR2_SLICE_TAG:
            val = slice_vals_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += struct.pack("<HHH", n_full, w_full, w_last)
    out += stream
    return bytes(out)


def decode_cr2_lossless(content: bytes) -> np.ndarray:
    """CR2 -> (H, W) uint16 sensor grid (lossless-JPEG raws)."""
    if content[:4] != b"II*\x00" or content[8:10] != b"CR":
        raise ValueError("not a CR2 payload")
    (raw_ifd_off,) = struct.unpack("<I", content[12:16])
    tags, _ = _read_ifd_at(content, "<", raw_ifd_off)
    compression = int(tags.get(259, [6])[0])
    if compression not in (6, 7):
        raise NotImplementedError(
            f"CR2: compression {compression} is not lossless JPEG"
        )
    offsets, counts = tags[273], tags[279]
    if len(offsets) != 1:
        raise NotImplementedError("CR2: multi-strip raw IFD unsupported")
    o, c = int(offsets[0]), int(counts[0])
    seg = ljpeg.decode_ljpeg(content[o : o + c])  # (h, w_sof, ncomp)
    h = seg.shape[0]
    total_w = seg.shape[1] * seg.shape[2]
    flat = seg.reshape(-1)
    if CR2_SLICE_TAG in tags:
        sl = tags[CR2_SLICE_TAG]
        if len(sl) != 3:
            raise ValueError("CR2: malformed slice tag")
        n_full, w_full, w_last = int(sl[0]), int(sl[1]), int(sl[2])
        widths = _slice_widths(n_full, w_full, w_last)
        if any(ws <= 0 for ws in widths) or sum(widths) != total_w:
            raise ValueError("CR2: slice widths do not cover the sensor")
    else:
        widths = [total_w]
    out = np.empty((h, total_w), dtype=np.uint16)
    pos = 0
    col = 0
    for ws in widths:
        n = h * ws
        out[:, col : col + ws] = flat[pos : pos + n].reshape(h, ws)
        pos += n
        col += ws
    return out


# --------------------------------------------------------------- NEF


def _pack_bits_be(vals: np.ndarray, bits: int) -> bytes:
    """Big-endian bit-pack uint16 samples at ``bits`` per sample
    (12/14/16), MSB-first — the TIFF-EP packing uncompressed NEFs
    use. Vectorized through a per-sample bit expansion."""
    if bits == 16:
        return vals.astype(">u2").tobytes()
    n = vals.size
    # bit matrix (n, bits) MSB-first -> flat bitstream -> bytes
    shifts = np.arange(bits - 1, -1, -1, dtype=np.uint16)
    bitmat = ((vals.reshape(-1, 1).astype(np.uint32) >> shifts) & 1).astype(
        np.uint8
    )
    stream = bitmat.reshape(-1)
    pad = (-stream.size) % 8
    if pad:
        stream = np.concatenate([stream, np.zeros(pad, dtype=np.uint8)])
    return np.packbits(stream).tobytes()


def _unpack_bits_be(data: bytes, n: int, bits: int) -> np.ndarray:
    if bits == 16:
        return np.frombuffer(data, dtype=">u2", count=n).astype(np.uint16)
    stream = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    need = n * bits
    if stream.size < need:
        raise ValueError("NEF: packed stream shorter than sample count")
    bitmat = stream[:need].reshape(n, bits).astype(np.uint16)
    weights = (1 << np.arange(bits - 1, -1, -1, dtype=np.uint16)).astype(
        np.uint16
    )
    return (bitmat * weights).sum(axis=1, dtype=np.uint32).astype(np.uint16)


def encode_nef_packed(arr: np.ndarray, bits: int = 12) -> bytes:
    """(H, W) uint16 sensor grid -> minimal TIFF-EP NEF: IFD0 is a
    tiny preview descriptor whose tag 330 (SubIFDs) points at the RAW
    IFD, samples bit-packed big-endian at 12/14/16 bits."""
    if arr.ndim != 2 or arr.dtype != np.uint16:
        raise ValueError("encode_nef_packed expects (H, W) uint16")
    if bits not in (12, 14, 16):
        raise ValueError("bits must be 12, 14, or 16")
    if int(arr.max(initial=0)) >= 1 << bits:
        raise ValueError(f"samples out of range for {bits}-bit packing")
    h, w = arr.shape
    # 16-bit samples follow the FILE byte order (TIFF 6.0) — this
    # writer emits an II header, so little-endian; sub-byte packings
    # are MSB-first regardless (FillOrder 1)
    if bits == 16:
        payload = arr.reshape(-1).astype("<u2").tobytes()
    else:
        payload = _pack_bits_be(arr.reshape(-1), bits)
    ifd0_entries = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (330, 4, 1, None),  # SubIFDs -> raw IFD, patched below
    ]
    raw_entries = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, 1, bits),
        (259, 3, 1, 1),    # uncompressed (packed)
        (262, 3, 1, 32803),  # CFA
        (273, 4, 1, None),
        (277, 3, 1, 1),
        (279, 4, 1, len(payload)),
    ]
    ifd0_off = 8
    raw_ifd_off = ifd0_off + 2 + 12 * len(ifd0_entries) + 4
    data_off = raw_ifd_off + 2 + 12 * len(raw_entries) + 4
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", ifd0_off)
    out += struct.pack("<H", len(ifd0_entries))
    for tag, typ, cnt, val in ifd0_entries:
        if tag == 330:
            val = raw_ifd_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += struct.pack("<H", len(raw_entries))
    for tag, typ, cnt, val in raw_entries:
        if tag == 273:
            val = data_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += payload
    return bytes(out)


def _walk_tiff_ep(content: bytes, fmt: str):
    """Shared TIFF-EP container walk (NEF and ARW use the identical
    structure): IFD0 -> SubIFDs (tag 330), pick the largest-area
    sub-IFD (real files keep a preview in IFD0 and the sensor in a
    SubIFD), raw-in-IFD0 fallback. -> (bo, tags0, raw_ifd_tags)."""
    bo = _parse_header(content)
    (ifd0_off,) = struct.unpack(bo + "I", content[4:8])
    tags0, _ = _read_ifd_at(content, bo, ifd0_off)
    candidates = []
    for sub_off in tags0.get(330, []):
        sub, _ = _read_ifd_at(content, bo, int(sub_off))
        if 256 in sub and 257 in sub:
            candidates.append(sub)
    if not candidates:
        if 273 in tags0:
            candidates.append(tags0)
        else:
            raise ValueError(f"{fmt}: no raw IFD found")
    raw = max(candidates, key=lambda t: int(t[256][0]) * int(t[257][0]))
    return bo, tags0, raw


def _decode_raw_strips(
    content: bytes, raw: dict, bo: str, fmt: str
) -> np.ndarray:
    """Compression-1 strip decode shared by NEF and ARW. TIFF strips
    are INDEPENDENTLY byte-aligned (TIFF 6.0 §3: each strip's
    bit-packing restarts at a byte boundary), so each strip is
    unpacked on its own — one continuous bitstream would silently
    desync every sample after strip 0 whenever rows_per_strip * w *
    bits is not a multiple of 8. 16-bit samples honor the FILE byte
    order; sub-byte packings are MSB-first (FillOrder 1)."""
    w, h = int(raw[256][0]), int(raw[257][0])
    _check_dims(w, h, fmt)
    bits = int(raw.get(258, [16])[0])
    if bits not in (12, 14, 16):
        raise NotImplementedError(
            f"{fmt}: {bits}-bit packing unsupported"
        )
    offsets, counts = raw[273], raw[279]
    rows_per_strip = int(raw.get(278, [h])[0])
    if rows_per_strip <= 0:
        raise ValueError(f"{fmt}: non-positive RowsPerStrip")
    strips = []
    row = 0
    for o, c in zip(offsets, counts):
        rows = min(rows_per_strip, h - row)
        if rows <= 0:
            raise ValueError(f"{fmt}: more strips than image rows")
        strips.append(
            _unpack_strip(
                content[int(o) : int(o) + int(c)], rows * w, bits, bo
            )
        )
        row += rows
    if row != h:
        raise ValueError(f"{fmt}: strips do not cover the image height")
    return np.concatenate(strips).reshape(h, w)


def decode_nef_packed(content: bytes) -> np.ndarray:
    """NEF (TIFF-EP) -> (H, W) uint16 sensor grid.

    Compression 1 decodes per-strip (12/14/16-bit, byte-order
    honoring); Nikon-compressed 34713 decodes through the vendor
    Huffman-diff codec below."""
    bo, tags0, raw = _walk_tiff_ep(content, "NEF")
    compression = int(raw.get(259, [1])[0])
    if compression == 34713:
        # pure-Python Huffman-diff decode (round 8); quarantines with
        # a precise reason only when the MakerNote table is unreadable
        return decode_nef_compressed(content, raw, bo, tags0)
    if compression != 1:
        raise NotImplementedError(
            f"NEF: compression {compression} unsupported"
        )
    return _decode_raw_strips(content, raw, bo, "NEF")


# ---------------------------------------------- Nikon-compressed NEF
# Compression 34713: Huffman-coded sample differences with two
# vertical seed predictors per row parity, a fixed vendor Huffman
# table selected by the linearization-table version bytes, and an
# optional tone curve — the layout is public via the dcraw/LibRaw
# lineage (nikon_load_raw) and the Nikon MakerNote notes
# (Exiv2/ExifTool tag 0x0096). The table lives in the Nikon
# MakerNote (IFD0 -> ExifIFD 0x8769 -> MakerNote 0x927C, a "Nikon"
# header wrapping an embedded TIFF whose IFD carries tag 0x0096).
#
# Decoder supports the documented variants (12/14-bit, lossy curve
# ver 0x44 with mid-image tree split, lossless ver 0x46); the
# encoder emits the lossless configuration so the roundtrip queries
# gate the bitstream, the predictor scheme, and the MakerNote walk
# bit-exactly on self-produced bytes.

# (counts for code lengths 1..16, leaf values) — DHT-style canonical
# specs. Leaf low nibble = diff bit-length, high nibble = reduced-
# precision shift (lossy after-split trees). Row 0 carries one pad
# leaf (0) to complete the code, matching the vendor table layout.
NIKON_TREES: list[tuple[list[int], list[int]]] = [
    # 12-bit lossy
    ([0, 1, 5, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0],
     [5, 4, 3, 6, 2, 7, 1, 0, 8, 9, 11, 10, 12, 0]),
    # 12-bit lossy after split
    ([0, 1, 5, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0],
     [0x39, 0x5A, 0x38, 0x27, 0x16, 5, 4, 3, 2, 1, 0, 11, 12, 12]),
    # 12-bit lossless
    ([0, 1, 4, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0],
     [5, 4, 6, 3, 7, 2, 8, 1, 9, 0, 10, 11, 12]),
    # 14-bit lossy
    ([0, 1, 4, 3, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0],
     [5, 6, 4, 7, 8, 3, 9, 2, 1, 0, 10, 11, 12, 13, 14]),
    # 14-bit lossy after split
    ([0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0],
     [8, 0x5C, 0x4B, 0x3A, 0x29, 7, 6, 5, 4, 3, 2, 1, 0, 13, 14]),
    # 14-bit lossless
    ([0, 1, 4, 2, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0],
     [7, 6, 8, 5, 9, 4, 10, 3, 11, 12, 2, 0, 1, 13, 14]),
]

MAKERNOTE_TAG = 0x927C
EXIF_IFD_TAG = 0x8769
NIKON_LINEARIZATION_TAG = 0x0096


def _nikon_decode_table(tree: int) -> dict[tuple[int, int], int]:
    """(length, code) -> leaf value, canonical assignment."""
    counts, values = NIKON_TREES[tree]
    table = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = values[vi]
            code += 1
            vi += 1
        code <<= 1
    return table


def _nikon_encode_table(tree: int) -> dict[int, tuple[int, int]]:
    """leaf value -> (code, length); first assignment wins for the
    pad-duplicated leaves."""
    out: dict[int, tuple[int, int]] = {}
    for (length, code), v in _nikon_decode_table(tree).items():
        out.setdefault(v, (code, length))
    return out


class _RawBits:
    """MSB-first bit I/O over an unstuffed stream (no 0xFF00 escapes —
    the NEF strip is not a JPEG entropy segment)."""

    def __init__(self, data: bytes = b"") -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()
        # set when a read refills past the end of data: a conforming
        # stream never needs bits beyond its payload (the encoder
        # pads only within the final byte), so overrun == truncation
        self.overrun = False

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos < len(self.data):
                b = self.data[self.pos]
            else:
                b = 0
                self.overrun = True
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _nikon_lin_parse(
    table: bytes, bits: int, bo: str
) -> tuple[int, np.ndarray, int, int, list[list[int]]]:
    """Linearization table -> (tree index, curve, split row, max).
    Mirrors the documented walk: version bytes select the tree;
    ver 0x44 0x20 carries a step-interpolated curve + split row at
    offset 562; other lossy versions carry the curve directly;
    lossless (0x46) keeps the identity curve."""

    def u16(off: int) -> int:
        return struct.unpack(bo + "H", table[off : off + 2])[0]

    ver0, ver1 = table[0], table[1]
    pos = 2
    if ver0 == 0x49 or ver1 == 0x58:
        pos += 2110  # big lens-data block precedes the predictors
    tree = 2 if ver0 == 0x46 else 0
    if bits == 14:
        tree += 3
    vpred = [[u16(pos), u16(pos + 2)], [u16(pos + 4), u16(pos + 6)]]
    pos += 8
    maxv = 1 << bits
    # identity-prefilled full-range curve, the documented baseline:
    # interpolation reads the identity values past the last anchor,
    # so the tail segment matches the reference lineage exactly
    curve = np.arange(0x10000, dtype=np.int64)
    csize = u16(pos)
    pos += 2
    step = maxv // (csize - 1) if csize > 1 else 0
    split = 0
    if ver0 == 0x44 and ver1 == 0x20 and step > 0:
        for i in range(csize):
            j = i * step
            if j < 0x10000:
                curve[j] = u16(pos + 2 * i)
        idx = np.arange(maxv, dtype=np.int64)
        frac = idx % step
        base = idx - frac
        anchors = curve.copy()
        curve[:maxv] = (
            anchors[base] * (step - frac) + anchors[base + step] * frac
        ) // step
        split = u16(562)
    elif ver0 != 0x46 and csize <= 0x4001:
        for i in range(csize):
            curve[i] = u16(pos + 2 * i)
        maxv = csize
    while maxv > 2 and curve[maxv - 2] == curve[maxv - 1]:
        maxv -= 1
    return tree, curve, split, maxv, vpred


def _nikon_diff_decode(reader: _RawBits, leaf: int) -> int:
    len_ = leaf & 15
    shl = leaf >> 4
    if len_ == 0:
        return 0
    raw = reader.read(len_ - shl)
    diff = ((raw << 1) + 1) << shl >> 1
    if (diff & (1 << (len_ - 1))) == 0:
        diff -= (1 << len_) - (0 if shl else 1)
    return diff


def decode_nef_compressed(
    content: bytes, raw_tags: dict, bo: str, tags0: dict
) -> np.ndarray:
    """Nikon 34713 strip -> (H, W) uint16 sensor grid. Raises
    NotImplementedError with a precise reason when the MakerNote
    linearization table cannot be located (the quarantine path)."""
    table = _find_nikon_linearization(content, bo, tags0)
    if table is None:
        raise NotImplementedError(
            "NEF: Nikon-compressed (34713) without a readable MakerNote "
            "linearization table (tag 0x0096) — install rawpy"
        )
    lin_bytes, lin_bo = table
    w, h = int(raw_tags[256][0]), int(raw_tags[257][0])
    _check_dims(w, h, "NEF")
    bits = int(raw_tags.get(258, [12])[0])
    if bits not in (12, 14):
        raise NotImplementedError(
            f"NEF: {bits}-bit Nikon-compressed unsupported"
        )
    try:
        tree, curve, split, maxv, vpred = _nikon_lin_parse(
            lin_bytes, bits, lin_bo
        )
    except (struct.error, IndexError) as exc:
        raise NotImplementedError(
            f"NEF: malformed Nikon linearization table ({exc}) — "
            "install rawpy"
        ) from exc
    o, c = int(raw_tags[273][0]), int(raw_tags[279][0])
    reader = _RawBits(content[o : o + c])
    dec = _nikon_decode_table(tree)
    out = np.empty((h, w), dtype=np.uint16)
    vpred = [list(vpred[0]), list(vpred[1])]
    minv = 0
    for row in range(h):
        if split and row == split:
            dec = _nikon_decode_table(tree + 1)
            minv = 16
            maxv += minv << 1
        hpred = [0, 0]
        for col in range(w):
            length = 0
            code = 0
            while True:
                length += 1
                if length > 16:
                    raise ValueError("NEF: invalid Huffman stream")
                code = (code << 1) | reader.read(1)
                leaf = dec.get((length, code))
                if leaf is not None:
                    break
            diff = _nikon_diff_decode(reader, leaf)
            if col < 2:
                vpred[row & 1][col] = (vpred[row & 1][col] + diff) & 0xFFFF
                hpred[col] = vpred[row & 1][col]
            else:
                hpred[col & 1] = (hpred[col & 1] + diff) & 0xFFFF
            v = hpred[col & 1]
            if (v + minv) & 0xFFFF >= maxv:
                raise ValueError("NEF: sample out of range (corrupt)")
            signed = v - 0x10000 if v >= 0x8000 else v
            out[row, col] = curve[min(max(signed, 0), 0x3FFF)]
    if reader.overrun:
        raise ValueError(
            "NEF: entropy stream truncated (decoder read past the "
            "strip payload)"
        )
    return out


def _find_nikon_linearization(
    content: bytes, bo: str, tags0: dict
) -> tuple[bytes, str] | None:
    """IFD0 -> ExifIFD (0x8769) -> MakerNote (0x927C): a 'Nikon'
    header wrapping an embedded TIFF whose byte order governs the
    table; returns (table bytes, byte order) or None."""
    exif_ptr = tags0.get(EXIF_IFD_TAG)
    if not exif_ptr:
        return None
    try:
        exif_tags, _ = _read_ifd_at(content, bo, int(exif_ptr[0]))
    except (struct.error, IndexError):
        return None
    mn = exif_tags.get(MAKERNOTE_TAG)
    if not mn or not isinstance(mn[0], (bytes, bytearray)):
        return None
    blob = bytes(mn[0])
    if not blob.startswith(b"Nikon\x00"):
        return None
    emb = blob[10:]  # embedded TIFF after the 10-byte Nikon header
    try:
        ebo = _parse_header(emb)
        (ifd_off,) = struct.unpack(ebo + "I", emb[4:8])
        etags, _ = _read_ifd_at(emb, ebo, ifd_off)
    except (ValueError, struct.error, IndexError):
        return None
    lin = etags.get(NIKON_LINEARIZATION_TAG)
    if not lin or not isinstance(lin[0], (bytes, bytearray)):
        return None
    return bytes(lin[0]), ebo


def encode_nef_compressed(arr: np.ndarray, bits: int = 12) -> bytes:
    """(H, W) uint16 sensor grid -> minimal Nikon-compressed NEF
    (lossless configuration: ver 0x46, identity curve, no split):
    IFD0 carries ExifIFD -> MakerNote -> linearization table AND
    SubIFDs -> raw IFD with Compression 34713."""
    if arr.ndim != 2 or arr.dtype != np.uint16:
        raise ValueError("encode_nef_compressed expects (H, W) uint16")
    if bits not in (12, 14):
        raise ValueError("bits must be 12 or 14")
    if int(arr.max(initial=0)) >= 1 << bits:
        raise ValueError(f"samples out of range for {bits}-bit coding")
    h, w = arr.shape
    tree = 2 if bits == 12 else 5
    enc = _nikon_encode_table(tree)
    seed = 1 << (bits - 1)
    vpred = [[seed, seed], [seed, seed]]
    writer = _RawBits()
    for row in range(h):
        hpred = [0, 0]
        for col in range(w):
            target = int(arr[row, col])
            if col < 2:
                pred = vpred[row & 1][col]
            else:
                pred = hpred[col & 1]
            diff = target - pred
            if diff == 0:
                ssss = 0
            else:
                ssss = abs(diff).bit_length()
                if ssss > bits:
                    raise ValueError("NEF: diff exceeds sample precision")
            code, length = enc[ssss]
            writer.write(code, length)
            if ssss:
                v = diff if diff > 0 else diff + (1 << ssss) - 1
                writer.write(v, ssss)
            if col < 2:
                vpred[row & 1][col] = target
                hpred[col] = target
            else:
                hpred[col & 1] = target
    payload = writer.flush()
    # linearization table: ver 0x46 0x30, vpred seeds, csize 1 (no
    # curve payload — identity), padded past offset 562 for shape
    # parity with real tables
    lin = bytearray([0x46, 0x30])
    for r in range(2):
        for c in range(2):
            lin += struct.pack("<H", seed)
    lin += struct.pack("<H", 1)  # csize
    lin += bytes(600 - len(lin))
    # embedded MakerNote TIFF: one IFD entry, tag 0x0096 type 7
    emb = bytearray(b"II*\x00") + struct.pack("<I", 8)
    emb += struct.pack("<H", 1)
    lin_off = 8 + 2 + 12 + 4
    emb += struct.pack(
        "<HHII", NIKON_LINEARIZATION_TAG, 7, len(lin), lin_off
    )
    emb += struct.pack("<I", 0)
    emb += lin
    makernote = b"Nikon\x00\x02\x10\x00\x00" + bytes(emb)

    ifd0_entries = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (330, 4, 1, None),            # SubIFDs -> raw IFD
        (EXIF_IFD_TAG, 4, 1, None),   # ExifIFD
    ]
    exif_entries = [(MAKERNOTE_TAG, 7, len(makernote), None)]
    raw_entries = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, 1, bits),
        (259, 3, 1, 34713),
        (262, 3, 1, 32803),
        (273, 4, 1, None),
        (277, 3, 1, 1),
        (279, 4, 1, len(payload)),
    ]
    ifd0_off = 8
    exif_off = ifd0_off + 2 + 12 * len(ifd0_entries) + 4
    mn_off = exif_off + 2 + 12 * len(exif_entries) + 4
    raw_ifd_off = mn_off + len(makernote)
    data_off = raw_ifd_off + 2 + 12 * len(raw_entries) + 4
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", ifd0_off)
    out += struct.pack("<H", len(ifd0_entries))
    for tag, typ, cnt, val in ifd0_entries:
        if tag == 330:
            val = raw_ifd_off
        elif tag == EXIF_IFD_TAG:
            val = exif_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += struct.pack("<H", len(exif_entries))
    for tag, typ, cnt, val in exif_entries:
        out += struct.pack("<HHII", tag, typ, cnt, mn_off)
    out += struct.pack("<I", 0)
    out += makernote
    out += struct.pack("<H", len(raw_entries))
    for tag, typ, cnt, val in raw_entries:
        if tag == 273:
            val = data_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += payload
    return bytes(out)


# --------------------------------------------------------------- ARW
# Sony ARW is the same TIFF-EP shape as NEF (IFD0 -> SubIFDs tag 330
# -> raw IFD; reference extension list filter_crop.py:39, decoded
# there via imageio other_tasks.py:45-51). Two deltas from the NEF
# path, both public TIFF 6.0 semantics: 16-bit samples follow the
# FILE byte order (ARWs are written little-endian; our NEF encoder
# emits big-endian payloads), and Sony's delta-compressed variant is
# Compression 32767 (128-sample curve blocks — library-bound).


def _unpack_strip(data: bytes, n: int, bits: int, bo: str) -> np.ndarray:
    """One byte-aligned strip -> n uint16 samples. Sub-byte packings
    are MSB-first (TIFF FillOrder 1) regardless of byte order; 16-bit
    samples follow ``bo`` ('<' or '>')."""
    if bits == 16:
        return np.frombuffer(
            data, dtype=bo + "u2", count=n
        ).astype(np.uint16)
    return _unpack_bits_be(data, n, bits)


def encode_arw_uncompressed(
    arr: np.ndarray, bits: int = 16, rows_per_strip: int = 0,
) -> bytes:
    """(H, W) uint16 sensor grid -> minimal TIFF-EP ARW: little-endian
    header, IFD0 with Make=SONY + SubIFDs -> raw IFD, Compression 1,
    samples little-endian at 16 bits or MSB-first packed at 12/14.
    ``rows_per_strip`` > 0 splits the payload into independently
    byte-aligned strips (TIFF 6.0 §3) — the multi-strip path the NEF
    encoder never exercises."""
    if arr.ndim != 2 or arr.dtype != np.uint16:
        raise ValueError("encode_arw_uncompressed expects (H, W) uint16")
    if bits not in (12, 14, 16):
        raise ValueError("bits must be 12, 14, or 16")
    if int(arr.max(initial=0)) >= 1 << bits:
        raise ValueError(f"samples out of range for {bits}-bit packing")
    h, w = arr.shape
    rps = rows_per_strip if rows_per_strip > 0 else h
    payloads = []
    for r0 in range(0, h, rps):
        rows = arr[r0 : r0 + rps]
        if bits == 16:
            payloads.append(rows.astype("<u2").tobytes())
        else:
            payloads.append(_pack_bits_be(rows.reshape(-1), bits))
    n_strips = len(payloads)
    make = b"SONY\x00\x00"  # tag 271, count 6 > 4 -> stored out-of-line
    ifd0_entries = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (271, 2, len(make), None),  # Make, patched below
        (330, 4, 1, None),          # SubIFDs -> raw IFD, patched below
    ]
    raw_entries = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, 1, bits),
        (259, 3, 1, 1),      # uncompressed
        (262, 3, 1, 32803),  # CFA
        (273, 4, n_strips, None),  # StripOffsets, patched below
        (277, 3, 1, 1),
        (278, 4, 1, rps),
        (279, 4, n_strips, None),  # StripByteCounts, patched below
    ]
    ifd0_off = 8
    make_off = ifd0_off + 2 + 12 * len(ifd0_entries) + 4
    raw_ifd_off = make_off + len(make)
    arrays_off = raw_ifd_off + 2 + 12 * len(raw_entries) + 4
    # out-of-line offset/count arrays only needed when n_strips > 1
    off_arr_off = arrays_off
    cnt_arr_off = off_arr_off + (4 * n_strips if n_strips > 1 else 0)
    data_off = cnt_arr_off + (4 * n_strips if n_strips > 1 else 0)
    strip_offsets = []
    pos = data_off
    for p in payloads:
        strip_offsets.append(pos)
        pos += len(p)
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", ifd0_off)
    out += struct.pack("<H", len(ifd0_entries))
    for tag, typ, cnt, val in ifd0_entries:
        if tag == 271:
            val = make_off
        elif tag == 330:
            val = raw_ifd_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += make
    out += struct.pack("<H", len(raw_entries))
    for tag, typ, cnt, val in raw_entries:
        if tag == 273:
            val = strip_offsets[0] if n_strips == 1 else off_arr_off
        elif tag == 279:
            val = len(payloads[0]) if n_strips == 1 else cnt_arr_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    if n_strips > 1:
        for o in strip_offsets:
            out += struct.pack("<I", o)
        for p in payloads:
            out += struct.pack("<I", len(p))
    for p in payloads:
        out += p
    return bytes(out)


# Sony ARW2 block coding (Compression 32767): each 16-byte block
# codes 16 pixels of ONE column parity across a 32-column span —
# 11-bit max + 11-bit min + 4-bit argmax + 4-bit argmin packed in the
# first 32 bits, then fourteen 7-bit deltas from min, scaled by the
# smallest shift with (max-min) >> sh < 0x80. The layout is public
# via the dcraw/LibRaw/rawspeed lineage (sony_arw2_load_raw). The
# format is lossy when (max-min) >= 0x80; the encoder below emits
# only exactly-representable blocks (it raises otherwise) so the
# roundtrip queries can hash-gate the decoder bit-exactly.

ARW2_SPAN = 32  # two 16-pixel blocks (even cols, then odd) per span


def _arw2_block_decode(block: bytes) -> list[int]:
    # pad: 16-bit reads at byte 15 stay in-bounds, and a degenerate
    # block (argmax == argmin) consumes a 15th delta whose field sits
    # past byte 16 entirely — zero bits, matching the reference's
    # read-past-block behavior deterministically
    block = block + b"\x00\x00\x00"
    (val,) = struct.unpack("<I", block[:4])
    mx = val & 0x7FF
    mn = (val >> 11) & 0x7FF
    imax = (val >> 22) & 0x0F
    imin = (val >> 26) & 0x0F
    sh = 0
    while sh < 4 and (0x80 << sh) <= mx - mn:
        sh += 1
    pix = [0] * 16
    bit = 30
    for i in range(16):
        if i == imax:
            pix[i] = mx
        elif i == imin:
            pix[i] = mn
        else:
            byte = bit >> 3
            word = struct.unpack("<H", block[byte : byte + 2])[0]
            pix[i] = min((((word >> (bit & 7)) & 0x7F) << sh) + mn, 0x7FF)
            bit += 7
    return pix


def _arw2_block_encode(pix: list[int]) -> bytes:
    if len(pix) != 16 or any(not 0 <= p <= 0x7FF for p in pix):
        raise ValueError("ARW2 block needs 16 samples in [0, 0x7ff]")
    mx, mn = max(pix), min(pix)
    imax, imin = pix.index(mx), pix.index(mn)
    if imax == imin:  # constant block: distinct slots required
        imin = (imax + 1) % 16
    sh = 0
    while sh < 4 and (0x80 << sh) <= mx - mn:
        sh += 1
    # one pad byte: the 128 payload bits end exactly at byte 16, but
    # the 16-bit read-modify-write of the last field touches byte 16
    out = bytearray(17)
    struct.pack_into(
        "<I", out, 0,
        (mx & 0x7FF) | ((mn & 0x7FF) << 11) | (imax << 22) | (imin << 26),
    )
    bit = 30
    for i in range(16):
        if i in (imax, imin):
            continue
        delta = pix[i] - mn
        if delta & ((1 << sh) - 1) or (delta >> sh) > 0x7F:
            raise ValueError(
                "ARW2: block not exactly representable (the format is "
                "lossy here) — delta %d at shift %d" % (delta, sh)
            )
        byte = bit >> 3
        word = struct.unpack("<H", out[byte : byte + 2])[0]
        word |= ((delta >> sh) & 0x7F) << (bit & 7)
        struct.pack_into("<H", out, byte, word)
        bit += 7
    return bytes(out[:16])


def _arw2_decode_payload(data: bytes, h: int, w: int) -> np.ndarray:
    """Row-major stream of 16-byte blocks -> (H, W) 11-bit grid.
    Each row is ``w`` bytes; within a 32-column span the first block
    fills even columns, the second odd columns.

    Vectorized over ALL blocks at once (they are independent): a real
    24 MP frame is ~1.5M blocks, and the per-block Python loop would
    dominate the mapInPandas batch. Degenerate blocks (argmax slot ==
    argmin slot, which no conforming encoder emits) fall back to the
    scalar decoder to keep bit-parity with the reference recipe."""
    if w % ARW2_SPAN:
        raise ValueError("ARW2: width must be a multiple of 32")
    if len(data) < h * w:  # one byte per pixel (16 bytes / 16 pixels)
        raise ValueError(
            f"ARW2: payload truncated ({len(data)} bytes for "
            f"{h}x{w} pixels)"
        )
    n = h * w // 16
    blocks = np.frombuffer(data, dtype=np.uint8, count=n * 16).reshape(
        n, 16
    ).astype(np.uint32)
    val = (
        blocks[:, 0]
        | (blocks[:, 1] << 8)
        | (blocks[:, 2] << 16)
        | (blocks[:, 3] << 24)
    )
    mx = val & 0x7FF
    mn = (val >> 11) & 0x7FF
    imax = (val >> 22) & 0x0F
    imin = (val >> 26) & 0x0F
    # signed: malformed blocks can carry mn > mx, where the reference
    # recipe's (0x80 << sh) <= mx - mn comparison never fires (sh=0)
    spread = mx.astype(np.int64) - mn.astype(np.int64)
    sh = (
        (spread >= 0x80).astype(np.uint32)
        + (spread >= 0x100)
        + (spread >= 0x200)
        + (spread >= 0x400)
    )
    # fourteen 7-bit fields starting at bit 30 of the 16-byte block
    deltas = np.empty((n, 14), dtype=np.uint32)
    for j in range(14):
        bit = 30 + 7 * j
        byte, shift = bit >> 3, bit & 7
        word = blocks[:, byte]
        if byte + 1 < 16:
            word = word | (blocks[:, byte + 1] << 8)
        deltas[:, j] = (word >> shift) & 0x7F
    scaled = np.minimum((deltas << sh[:, None]) + mn[:, None], 0x7FF)
    rows_idx = np.arange(n)
    slot_is_delta = np.ones((n, 16), dtype=bool)
    slot_is_delta[rows_idx, imax] = False
    slot_is_delta[rows_idx, imin] = False
    pix = np.empty((n, 16), dtype=np.uint16)
    normal = imax != imin
    if normal.all():
        pix[slot_is_delta] = scaled.reshape(-1)
    else:
        nr = rows_idx[normal]
        cols = np.nonzero(slot_is_delta[normal])[1].reshape(-1, 14)
        pix[nr[:, None], cols] = scaled[normal]
    pix[rows_idx, imin] = mn.astype(np.uint16)
    pix[rows_idx, imax] = mx.astype(np.uint16)
    for b in rows_idx[~normal]:  # malformed: scalar parity path
        pix[b] = _arw2_block_decode(data[b * 16 : b * 16 + 16])
    # interleave: per 32-column span, block 0 -> even cols, 1 -> odd
    pix4 = pix.reshape(h, w // ARW2_SPAN, 2, 16)
    out = np.empty((h, w // ARW2_SPAN, ARW2_SPAN), dtype=np.uint16)
    out[:, :, 0::2] = pix4[:, :, 0, :]
    out[:, :, 1::2] = pix4[:, :, 1, :]
    return out.reshape(h, w)


def _arw2_encode_payload(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    if w % ARW2_SPAN:
        raise ValueError("ARW2: width must be a multiple of 32")
    out = bytearray()
    for row in range(h):
        for span in range(0, w, ARW2_SPAN):
            for parity in (0, 1):
                pix = [int(v) for v in
                       arr[row, span + parity : span + ARW2_SPAN : 2]]
                out += _arw2_block_encode(pix)
    return bytes(out)


def encode_arw_compressed(arr: np.ndarray) -> bytes:
    """(H, W) uint16 grid of 11-bit samples, width % 32 == 0 ->
    minimal Sony-compressed ARW (Compression 32767). Raises when a
    block is not exactly representable — the hash-gated roundtrip
    feeds data inside the exact subset (per-block max-min < 0x80)."""
    if arr.ndim != 2 or arr.dtype != np.uint16:
        raise ValueError("encode_arw_compressed expects (H, W) uint16")
    if int(arr.max(initial=0)) > 0x7FF:
        raise ValueError("ARW2 samples are 11-bit")
    h, w = arr.shape
    payload = _arw2_encode_payload(arr)
    raw_entries = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, 1, 12),
        (259, 3, 1, 32767),
        (262, 3, 1, 32803),
        (273, 4, 1, None),
        (277, 3, 1, 1),
        (279, 4, 1, len(payload)),
    ]
    ifd0_entries = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (330, 4, 1, None),
    ]
    ifd0_off = 8
    raw_ifd_off = ifd0_off + 2 + 12 * len(ifd0_entries) + 4
    data_off = raw_ifd_off + 2 + 12 * len(raw_entries) + 4
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", ifd0_off)
    out += struct.pack("<H", len(ifd0_entries))
    for tag, typ, cnt, val in ifd0_entries:
        if tag == 330:
            val = raw_ifd_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += struct.pack("<H", len(raw_entries))
    for tag, typ, cnt, val in raw_entries:
        if tag == 273:
            val = data_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += payload
    return bytes(out)


def decode_arw(content: bytes) -> np.ndarray:
    """ARW (Sony TIFF-EP) -> (H, W) uint16 sensor grid.

    Same SubIFD walk as NEF; Compression 1 decodes per-strip
    (byte-order-honoring 16-bit, MSB-first packed 12/14-bit) and
    Sony's block-compressed 32767 decodes through the ARW2 block
    codec (11-bit coded domain — tone curves are a display concern,
    matching the DNG/NEF policy of returning the sensor grid)."""
    bo, _tags0, raw = _walk_tiff_ep(content, "ARW")
    compression = int(raw.get(259, [1])[0])
    if compression == 32767:
        w, h = int(raw[256][0]), int(raw[257][0])
        _check_dims(w, h, "ARW")
        o, c = int(raw[273][0]), int(raw[279][0])
        return _arw2_decode_payload(content[o : o + c], h, w)
    if compression != 1:
        raise NotImplementedError(
            f"ARW: compression {compression} unsupported"
        )
    return _decode_raw_strips(content, raw, bo, "ARW")


# ------------------------------------------------- display adapters


def _display(sensor: np.ndarray) -> np.ndarray:
    disp = (sensor >> 8).astype(np.uint8)
    return np.repeat(disp[:, :, None], 3, axis=2)


def decode_cr2_display(content: bytes) -> np.ndarray:
    """Registry adapter for .cr2: sensor grid tone-mapped to 8-bit
    gray RGB (top byte — same policy as decode_dng_display)."""
    return _display(decode_cr2_lossless(content))


def decode_nef_display(content: bytes) -> np.ndarray:
    """Registry adapter for .nef."""
    return _display(decode_nef_packed(content))


def decode_arw_display(content: bytes) -> np.ndarray:
    """Registry adapter for .arw."""
    return _display(decode_arw(content))
