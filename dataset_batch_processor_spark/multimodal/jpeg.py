"""Pure-Python baseline JPEG codec (numpy + stdlib only).

S3/K1/P12 parity for the reference's DEFAULT image format
(/root/reference/modules/tiling.py:68 saves JPG; other_tasks.py:54-60
JPEG save options; RGB coercion pre-JPEG = P12): baseline sequential
DCT with Huffman entropy coding, implemented from the public JPEG
spec (ITU-T T.81) — no PIL/libjpeg.

Scope:
- decode: baseline SOF0/1 AND progressive SOF2 (T.81 Annex G
  successive-approximation + spectral-selection scan assembly: DC
  first/refine, AC first/refine with EOB runs — the algorithms are
  re-derived from the public spec, figure G.2/G.7 semantics), 8-bit,
  1 or 3 components, sampling factors up to 2x2 (nearest-neighbor
  chroma upsampling), restart intervals, tables read from the stream
  (so externally produced JPEGs decode too). Lossless/hierarchical
  frames and arithmetic coding raise NotImplementedError into the F7
  quarantine.
- encode: baseline 4:4:4 (default) or 4:2:0 (``subsample=True``),
  quality-scaled Annex K quant tables, standard Annex K Huffman
  tables, JFIF header; plus :func:`encode_jpeg_progressive` (4:4:4,
  a libjpeg-style scan script exercising every progressive scan
  kind). Grayscale input is promoted to RGB first (P12 coercion
  direction).

Lossy by nature: roundtrip tests bound reconstruction error rather
than demanding bit equality; determinism is exact (pure integer/
float pipeline, no randomness), so the oracle query can assert the
error bound under the driver's value-hash gate.

Performance note: entropy coding is a per-block Python loop —
adequate for tile-sized images inside Arrow batches; a production
deployment registers libjpeg-turbo via register_codec and keeps this
as the dependency-free fallback.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman specs: (bits[1..16], values)
DC_LUMA_SPEC = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _c = np.sqrt(0.125) if _k == 0 else 0.5
        _T[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ------------------------------------------------------------ Huffman


def _build_codes(spec):
    """(bits, values) -> {value: (code, length)} (canonical)."""
    bits, values = spec
    codes = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            codes[values[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return codes


def _build_decode_table(spec):
    """(bits, values) -> {(length, code): value}."""
    bits, values = spec
    table = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = values[vi]
            code += 1
            vi += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # un-stuff
                else:
                    # marker: rewind and starve the reader
                    self.pos -= 1
                    return
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                # Past-end: T.81 F.2.2.5 pads the entropy stream with
                # 1-bits. Returning 1 (not 0) keeps truncated or
                # externally produced progressive streams on the spec
                # decode path (a 0 here could flip a trailing EOB-run
                # or magnitude read).
                return 1
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude to signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (category t, t-bit code)."""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


# ------------------------------------------------------------- encoder


def _encode_block(bw_writer, zz, dc_codes, ac_codes, prev_dc):
    """Entropy-code one zigzagged quantized block; returns new DC."""
    diff = int(zz[0]) - prev_dc
    t, mag = _magnitude(diff)
    code, ln = dc_codes[t]
    bw_writer.write(code, ln)
    if t:
        bw_writer.write(mag, t)
    run = 0
    any_ac = bool(np.any(zz[1:]))
    last_nz = int(np.max(np.nonzero(zz)[0])) if any_ac else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw_writer.write(code, ln)
            run -= 16
        t, mag = _magnitude(v)
        code, ln = ac_codes[(run << 4) | t]
        bw_writer.write(code, ln)
        bw_writer.write(mag, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw_writer.write(code, ln)
    return int(zz[0])


def _dct_quant(plane, q, level=128.0):
    """(bh*8, bw*8) plane -> (bh, bw, 64) zigzagged quantized coefs."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - level
    coef = np.einsum("ij,abjk,lk->abil", _T, blocks, _T)
    quant = np.round(coef / q).astype(np.int64)
    return quant.reshape(bh, bw, 64)[:, :, ZIGZAG]


def encode_jpeg(
    arr: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """H x W x 3 (or H x W gray) uint8 -> baseline JFIF bytes.

    ``subsample=False`` -> 4:4:4 (default: best fidelity for tiles);
    ``subsample=True`` -> 4:2:0 (2x2 Y per MCU, chroma averaged over
    2x2 pixels — the layout virtually all camera/web JPEGs use, so
    the decoder's multi-block MCU + upsampling path gets exercised
    by self-produced streams too)."""
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)  # P12 coercion
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects H x W x 3 uint8")
    h, w, _ = arr.shape
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg: empty image")

    # RGB -> YCbCr (JFIF)
    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = 128 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
    cr = 128 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]

    qy = _scaled_quant(QUANT_LUMA, quality).reshape(8, 8)
    qc = _scaled_quant(QUANT_CHROMA, quality).reshape(8, 8)

    dc_l = _build_codes(DC_LUMA_SPEC)
    ac_l = _build_codes(AC_LUMA_SPEC)
    dc_c = _build_codes(DC_CHROMA_SPEC)
    ac_c = _build_codes(AC_CHROMA_SPEC)

    bw_writer = _BitWriter()
    if not subsample:
        bh, bw_ = (h + 7) // 8, (w + 7) // 8

        def pad8(ch):
            return np.pad(ch, ((0, bh * 8 - h), (0, bw_ * 8 - w)), mode="edge")

        qz = [_dct_quant(pad8(p), q)
              for p, q in ((y, qy), (cb, qc), (cr, qc))]
        prev_dc = [0, 0, 0]
        for by in range(bh):
            for bx in range(bw_):
                for ci in range(3):
                    prev_dc[ci] = _encode_block(
                        bw_writer, qz[ci][by, bx],
                        dc_l if ci == 0 else dc_c,
                        ac_l if ci == 0 else ac_c,
                        prev_dc[ci],
                    )
        samplings = ((1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1))
    else:
        mcux, mcuy = (w + 15) // 16, (h + 15) // 16
        ypad = np.pad(y, ((0, mcuy * 16 - h), (0, mcux * 16 - w)), mode="edge")
        # chroma: 2x2 average, then pad to the MCU grid
        def down(ch):
            che = np.pad(ch, ((0, h % 2), (0, w % 2)), mode="edge")
            d = (che[0::2, 0::2] + che[0::2, 1::2]
                 + che[1::2, 0::2] + che[1::2, 1::2]) / 4.0
            dh, dw = d.shape
            return np.pad(
                d, ((0, mcuy * 8 - dh), (0, mcux * 8 - dw)), mode="edge"
            )

        qz_y = _dct_quant(ypad, qy)
        qz_cb = _dct_quant(down(cb), qc)
        qz_cr = _dct_quant(down(cr), qc)
        prev_dc = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                for v_blk in range(2):
                    for h_blk in range(2):
                        prev_dc[0] = _encode_block(
                            bw_writer,
                            qz_y[my * 2 + v_blk, mx * 2 + h_blk],
                            dc_l, ac_l, prev_dc[0],
                        )
                prev_dc[1] = _encode_block(
                    bw_writer, qz_cb[my, mx], dc_c, ac_c, prev_dc[1]
                )
                prev_dc[2] = _encode_block(
                    bw_writer, qz_cr[my, mx], dc_c, ac_c, prev_dc[2]
                )
        samplings = ((1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1))
    entropy = bw_writer.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def dht(tclass, tid, spec):
        bits, values = spec
        return seg(0xC4, bytes([tclass << 4 | tid]) + bytes(bits[1:]) + bytes(values))

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(qy.ravel()[ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, b"\x01" + bytes(qc.ravel()[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, hv, tq in samplings:
        sof += bytes([cid, hv, tq])
    out += seg(0xC0, sof)
    out += dht(0, 0, DC_LUMA_SPEC) + dht(1, 0, AC_LUMA_SPEC)
    out += dht(0, 1, DC_CHROMA_SPEC) + dht(1, 1, AC_CHROMA_SPEC)
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _flat_huff_spec(symbols):
    """Canonical Huffman spec giving every symbol the same code
    length L, the smallest with 2^L > n (the all-ones code of the
    max length stays unused, per T.81 convention). Optimality is
    irrelevant here — the decoder reads whatever DHT the stream
    carries — but the table must COVER the 12-bit alphabet, which
    the Annex K specs (DC categories <= 11, AC sizes <= 10) do not."""
    vals = sorted(symbols)
    n = len(vals)
    length = max(1, (n + 1 - 1).bit_length())
    while (1 << length) <= n:
        length += 1
    bits = [0] * 17
    bits[length] = n
    return bits, vals


def encode_jpeg12_gray(arr: np.ndarray, quality: int = 90) -> bytes:
    """H x W uint16 (0..4095) -> 12-bit extended-sequential (SOF1)
    grayscale JPEG. Same DCT/quant/entropy pipeline as the 8-bit
    encoder with a 2048 level shift; the Huffman tables are built
    from the symbols the stream actually emits (12-bit DC categories
    reach 15 and AC sizes 14 — beyond the Annex K specs), emitted as
    flat canonical DHTs. Quant values stay <= 255 so DQT Pq=0; the
    decoder's Pq=1 path is pinned separately by a hand-built test."""
    if arr.ndim != 2 or arr.dtype != np.uint16:
        raise ValueError("encode_jpeg12_gray expects H x W uint16")
    if arr.max(initial=0) > 4095:
        raise ValueError("encode_jpeg12_gray: samples exceed 12 bits")
    h, w = arr.shape
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg12_gray: empty image")
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    plane = np.pad(
        arr.astype(np.float64), ((0, bh * 8 - h), (0, bw_ * 8 - w)),
        mode="edge",
    )
    q = _scaled_quant(QUANT_LUMA, quality).reshape(8, 8)
    zz = _dct_quant(plane, q, level=2048.0).reshape(-1, 64)

    # pass 1: collect the emitted alphabet
    dc_syms, ac_syms = set(), set()
    prev = 0
    for b in zz:
        t, _ = _magnitude(int(b[0]) - prev)
        prev = int(b[0])
        dc_syms.add(t)
        run = 0
        nz = np.nonzero(b[1:])[0]
        last = int(nz.max()) + 1 if nz.size else 0
        for k in range(1, last + 1):
            v = int(b[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_syms.add(0xF0)
                run -= 16
            ac_syms.add((run << 4) | _magnitude(v)[0])
            run = 0
        if last < 63:
            ac_syms.add(0x00)
    dc_spec = _flat_huff_spec(dc_syms)
    ac_spec = _flat_huff_spec(ac_syms)
    dc_codes = _build_codes(dc_spec)
    ac_codes = _build_codes(ac_spec)

    bw_writer = _BitWriter()
    prev = 0
    for b in zz:
        prev = _encode_block(bw_writer, b, dc_codes, ac_codes, prev)
    entropy = bw_writer.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + bytes(q.ravel()[ZIGZAG].astype(np.uint8)))
    out += seg(0xC1, struct.pack(">BHHB", 12, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_spec[0][1:]) + bytes(dc_spec[1]))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_spec[0][1:]) + bytes(ac_spec[1]))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------- decoder


def _next_marker(content: bytes, pos: int) -> int:
    """Position of the next real marker at/after ``pos`` (skips
    entropy-coded bytes, FF00 stuffing, FF fill bytes, and RSTn)."""
    n = len(content)
    while pos < n - 1:
        if content[pos] == 0xFF:
            nxt = content[pos + 1]
            if nxt == 0x00:
                pos += 2
                continue
            if nxt == 0xFF:  # fill byte
                pos += 1
                continue
            if 0xD0 <= nxt <= 0xD7:  # restart marker inside scan data
                pos += 2
                continue
            return pos
        pos += 1
    return n


def decode_jpeg(content: bytes) -> np.ndarray:
    """JFIF/JPEG bytes (baseline SOF0/1 or progressive SOF2) ->
    H x W x 3 uint8 RGB."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    coefs: dict[int, np.ndarray] | None = None
    while pos < len(content):
        if content[pos] != 0xFF:
            pos += 1
            continue
        marker = content[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", content[pos : pos + 2])
        payload = content[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(
                        payload, dtype=">u2", count=64, offset=p
                    ).astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(
                        payload, dtype=np.uint8, count=64, offset=p
                    ).astype(np.int64)
                    p += 64
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = vals  # de-zigzag
                quant[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = [0] + list(payload[p + 1 : p + 17])
                nvals = sum(bits)
                values = list(payload[p + 17 : p + 17 + nvals])
                huff[(tc, th)] = _build_decode_table(([0] + bits[1:], values))
                p += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision, fh, fw, nc = struct.unpack(">BHHB", payload[:6])
            # 12-bit extended sequential (SOF1, T.81 table B.2) decodes
            # through the same scan machinery with a parametrized level
            # shift + clamp (round 8); 12-bit progressive stays out.
            if precision not in (8, 12) or (precision == 12 and marker == 0xC2):
                raise NotImplementedError(
                    f"JPEG: {precision}-bit precision unsupported"
                    + (" for progressive" if marker == 0xC2 else "")
                )
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {
                "h": fh, "w": fw, "comps": comps,
                "precision": precision,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG: unsupported frame type (marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = payload[0]
            scan = []
            for i in range(ns):
                cs, tt = payload[1 + 2 * i], payload[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "td": tt >> 4, "ta": tt & 0xF})
            data_start = pos + seg_len
            if not frame["progressive"]:
                return _decode_scan(
                    content, data_start, frame, scan, quant, huff,
                    restart_interval,
                )
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            if coefs is None:
                coefs = _init_coef_store(frame)
            end = _decode_progressive_scan(
                content, data_start, frame, scan,
                (ss, se, ahal >> 4, ahal & 0xF),
                huff, coefs, restart_interval,
            )
            pos = _next_marker(content, end)
            continue
        pos += seg_len
    if coefs is not None:
        return _reconstruct_progressive(frame, coefs, quant)
    raise ValueError("JPEG: no scan data found")


def _decode_scan(content, start, frame, scan, quant, huff, restart_interval):
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)

    prec = frame.get("precision", 8)
    level = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    planes = {}
    for c in scan:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes[c["id"]] = np.zeros((ph, pw), dtype=np.float64)

    reader = _BitReader(content)
    reader.pos = start

    def read_huff(table):
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("JPEG: invalid Huffman code")

    prev_dc = {c["id"]: 0 for c in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align()
                # skip RSTn marker
                while (
                    reader.pos + 1 < len(content)
                    and content[reader.pos] == 0xFF
                    and 0xD0 <= content[reader.pos + 1] <= 0xD7
                ):
                    reader.pos += 2
                for c in scan:
                    prev_dc[c["id"]] = 0
            for c in scan:
                dc_tab = huff[(0, c["td"])]
                ac_tab = huff[(1, c["ta"])]
                q = quant[c["tq"]]
                for v_blk in range(c["v"]):
                    for h_blk in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = read_huff(dc_tab)
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        prev_dc[c["id"]] += diff
                        zz[0] = prev_dc[c["id"]]
                        k = 1
                        while k < 64:
                            rs = read_huff(ac_tab)
                            r, t = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            zz[k] = _extend(reader.read_bits(t), t)
                            k += 1
                        blk = np.zeros(64, dtype=np.int64)
                        blk[ZIGZAG] = zz
                        coef = blk.reshape(8, 8) * q
                        pixels = _T.T @ coef @ _T + level
                        py = (my * c["v"] + v_blk) * 8
                        px = (mx * c["h"] + h_blk) * 8
                        planes[c["id"]][py : py + 8, px : px + 8] = pixels
            mcu_count += 1

    # upsample to full resolution (nearest), crop, color-convert
    full = {}
    for c in scan:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full[c["id"]] = p[:fh, :fw]

    shift = prec - 8  # display tone map: top byte (no-op at 8-bit)
    if len(scan) == 1:
        y = np.clip(full[scan[0]["id"]], 0, maxv).astype(np.int64) >> shift
        return np.repeat(y[:, :, None].astype(np.uint8), 3, axis=2)
    y = full[scan[0]["id"]]
    cb = full[scan[1]["id"]] - level
    cr = full[scan[2]["id"]] - level
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.stack([r, g, b], axis=2), 0, maxv).astype(np.int64)
    return (rgb >> shift).astype(np.uint8)


# ------------------------------------------------- progressive decoding
# T.81 Annex G scan assembly. Coefficients accumulate across scans in
# per-component (blocks_v, blocks_h, 64) int64 arrays in ZIGZAG index
# space (scans address coefficient k in zigzag order); de-zigzag +
# dequant + IDCT happen once, after EOI.


def _grid(frame):
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _comp_blocks(frame, c):
    """Actual block count of one component (non-interleaved scans
    iterate these, NOT the MCU-padded grid — T.81 A.2.2)."""
    hmax, vmax, _, _ = _grid(frame)
    sw = (frame["w"] * c["h"] + hmax - 1) // hmax
    sh = (frame["h"] * c["v"] + vmax - 1) // vmax
    return (sh + 7) // 8, (sw + 7) // 8  # (rows, cols)


def _init_coef_store(frame):
    _, _, mcux, mcuy = _grid(frame)
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
        for c in frame["comps"]
    }


def _ac_first_block(reader, read_huff, ac_tab, blk, ss, se, al, eobrun):
    """Figure G.3/G.4 semantics: first pass over band [ss..se] at
    approximation al; returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = read_huff(ac_tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                eb = (1 << r) - 1  # this block consumes one
                if r:
                    eb += reader.read_bits(r)
                return eb
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG: AC index overflow in progressive scan")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, read_huff, ac_tab, blk, ss, se, al, eobrun):
    """Figure G.7 semantics (correction-bit pass). Magnitudes are
    sign-magnitude: a correction bit of 1 grows |coef| by 2^al the
    first time bit al is clear; newly-significant coefficients arrive
    as ±2^al positioned by a run over ZERO-HISTORY coefficients only."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k):
        v = int(blk[k])
        if reader.read_bit() and (abs(v) & p1) == 0:
            blk[k] = v + (p1 if v > 0 else m1)

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = read_huff(ac_tab)
            r, s = rs >> 4, rs & 15
            val = 0
            if s:
                # per G.1.2.3 only s=1 is legal in a refinement scan
                val = p1 if reader.read_bit() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                break  # rest of the block joins the EOB correction pass
            # advance: skip r zero-history coefficients, correcting
            # every nonzero-history coefficient passed over
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # correction bits for the remainder of the band
            if blk[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    content, start, frame, scan, band, huff, coefs, restart_interval
):
    ss, se, ah, al = band
    reader = _BitReader(content)
    reader.pos = start

    def read_huff(table):
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("JPEG: invalid Huffman code")

    interleaved = len(scan) > 1
    if ss == 0 and se != 0:
        raise ValueError(
            "JPEG: progressive scan mixing DC and AC (Ss=0, Se!=0) is "
            "illegal (T.81 G.1.1.1)"
        )
    if interleaved and ss != 0:
        raise ValueError("JPEG: interleaved progressive AC scan is illegal")
    _, _, mcux, mcuy = _grid(frame)
    if interleaved:
        n_units = mcux * mcuy
    else:
        nbh, nbw = _comp_blocks(frame, scan[0])
        n_units = nbh * nbw
    prev_dc = {c["id"]: 0 for c in scan}
    eobrun = 0

    def dc_block(c, blk):
        nonlocal prev_dc
        if ah == 0:
            t = read_huff(huff[(0, c["td"])])
            diff = _extend(reader.read_bits(t), t) if t else 0
            prev_dc[c["id"]] += diff
            blk[0] = prev_dc[c["id"]] << al
        else:
            # DC refinement: straight-binary successive bit (OR works
            # for negatives in two's complement — G.1.2.1)
            if reader.read_bit():
                blk[0] = int(blk[0]) | (1 << al)

    for unit in range(n_units):
        if restart_interval and unit and unit % restart_interval == 0:
            reader.align()
            while (
                reader.pos + 1 < len(content)
                and content[reader.pos] == 0xFF
                and 0xD0 <= content[reader.pos + 1] <= 0xD7
            ):
                reader.pos += 2
            prev_dc = {c["id"]: 0 for c in scan}
            eobrun = 0
        if interleaved:
            my, mx = unit // mcux, unit % mcux
            for c in scan:
                store = coefs[c["id"]]
                for vb in range(c["v"]):
                    for hb in range(c["h"]):
                        dc_block(c, store[my * c["v"] + vb, mx * c["h"] + hb])
        else:
            c = scan[0]
            by, bx = unit // nbw, unit % nbw
            blk = coefs[c["id"]][by, bx]
            if ss == 0:
                dc_block(c, blk)
            elif ah == 0:
                eobrun = _ac_first_block(
                    reader, read_huff, huff[(1, c["ta"])], blk, ss, se, al,
                    eobrun,
                )
            else:
                eobrun = _ac_refine_block(
                    reader, read_huff, huff[(1, c["ta"])], blk, ss, se, al,
                    eobrun,
                )
    return reader.pos


def _reconstruct_progressive(frame, coefs, quant):
    fh, fw = frame["h"], frame["w"]
    hmax, vmax, _, _ = _grid(frame)
    full = {}
    for c in frame["comps"]:
        zz = coefs[c["id"]]
        bh, bw_ = zz.shape[0], zz.shape[1]
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz  # de-zigzag
        coef = nat.reshape(bh, bw_, 8, 8) * quant[c["tq"]]
        # batched IDCT: out = T.T @ coef @ T per block
        pix = np.einsum("ji,abjk,kl->abil", _T, coef, _T) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full[c["id"]] = plane[:fh, :fw]
    comps = frame["comps"]
    if len(comps) == 1:
        y = np.clip(full[comps[0]["id"]], 0, 255)
        return np.repeat(y[:, :, None].astype(np.uint8), 3, axis=2)
    y = full[comps[0]["id"]]
    cb = full[comps[1]["id"]] - 128.0
    cr = full[comps[2]["id"]] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# ------------------------------------------------- progressive encoder
# 4:4:4, a libjpeg-style scan script that exercises every progressive
# scan kind: interleaved DC first (Al=1) and DC refinement, split-band
# AC first passes at Al=1 with EOB runs, single-pass chroma AC, and an
# AC refinement pass. The AC scans use a flat fixed Huffman table (all
# 192 possible symbols at 8 bits — canonically valid, no all-ones
# code) so EOB-run symbols 0x10..0xE0, which Annex K tables lack, are
# codeable without per-scan optimal table generation; this is a
# fixture/parity encoder, not a compression play.

PROG_AC_SPEC = (
    [0, 0, 0, 0, 0, 0, 0, 0, 192, 0, 0, 0, 0, 0, 0, 0, 0],
    sorted(
        [r << 4 for r in range(16)]
        + [(r << 4) | s for r in range(16) for s in range(1, 12)]
    ),
)

#: (comp indices, Ss, Se, Ah, Al) — see module docstring
PROG_SCRIPT = (
    ((0, 1, 2), 0, 0, 0, 1),  # DC first, interleaved, Al=1
    ((0,), 1, 5, 0, 1),       # Y AC 1-5 first, Al=1
    ((0,), 6, 63, 0, 1),      # Y AC 6-63 first, Al=1
    ((1,), 1, 63, 0, 0),      # Cb AC full first
    ((2,), 1, 63, 0, 0),      # Cr AC full first
    ((0,), 1, 63, 1, 0),      # Y AC refinement Ah=1 -> Al=0
    ((0, 1, 2), 0, 0, 1, 0),  # DC refinement (raw bits)
)


def _tzshift(v: int, al: int) -> int:
    """T.81 point transform for AC: |v| >> al with the sign kept
    (truncation toward zero, NOT arithmetic shift)."""
    return -((-v) >> al) if v < 0 else v >> al


class _ProgACState:
    """Per-scan EOB-run + buffered-correction-bit state (G.1.2.2-3)."""

    def __init__(self, writer, ac_codes):
        self.w = writer
        self.ac = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []

    def emit_symbol(self, sym):
        code, ln = self.ac[sym]
        self.w.write(code, ln)

    def flush_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.emit_symbol(nbits << 4)
            if nbits:
                self.w.write(self.eobrun & ((1 << nbits) - 1), nbits)
            for bit in self.pending:
                self.w.write(bit, 1)
            self.pending = []
            self.eobrun = 0


def _encode_ac_first_block(st: _ProgACState, zz, ss, se, al):
    band = [_tzshift(int(zz[k]), al) for k in range(ss, se + 1)]
    if not any(band):
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()
        return
    st.flush_eobrun()
    r = 0
    last_nz = max(i for i, v in enumerate(band) if v)
    for v in band[: last_nz + 1]:
        if v == 0:
            r += 1
            continue
        while r > 15:
            st.emit_symbol(0xF0)  # ZRL
            r -= 16
        t, mag = _magnitude(v)
        st.emit_symbol((r << 4) | t)
        st.w.write(mag, t)
        r = 0
    if last_nz < len(band) - 1:
        st.eobrun += 1  # trailing zeros of this band join an EOB run
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


def _encode_ac_refine_block(st: _ProgACState, zz, ss, se, al):
    vals = [int(zz[k]) for k in range(ss, se + 1)]
    ab = [abs(v) >> al for v in vals]
    eob_rel = -1  # last newly-significant index
    for i, a in enumerate(ab):
        if a == 1:
            eob_rel = i
    r = 0
    br: list[int] = []
    for i, a in enumerate(ab):
        if a == 0:
            r += 1
            continue
        while r > 15 and i <= eob_rel:
            st.flush_eobrun()
            st.emit_symbol(0xF0)
            r -= 16
            for bit in br:
                st.w.write(bit, 1)
            br = []
        if a > 1:  # history coefficient: buffered correction bit
            br.append(a & 1)
            continue
        st.flush_eobrun()
        st.emit_symbol((r << 4) | 1)
        st.w.write(1 if vals[i] >= 0 else 0, 1)
        for bit in br:
            st.w.write(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.pending.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 85) -> bytes:
    """H x W x 3 (or H x W gray) uint8 -> progressive (SOF2) JFIF
    bytes, 4:4:4, scan script ``PROG_SCRIPT``."""
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)  # P12 coercion
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive expects H x W x 3 uint8")
    h, w, _ = arr.shape
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg_progressive: empty image")

    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = 128 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
    cr = 128 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]

    qy = _scaled_quant(QUANT_LUMA, quality).reshape(8, 8)
    qc = _scaled_quant(QUANT_CHROMA, quality).reshape(8, 8)
    bh, bw_ = (h + 7) // 8, (w + 7) // 8

    def pad8(ch):
        return np.pad(ch, ((0, bh * 8 - h), (0, bw_ * 8 - w)), mode="edge")

    qz = [_dct_quant(pad8(p), q) for p, q in ((y, qy), (cb, qc), (cr, qc))]

    dc_codes = [_build_codes(DC_LUMA_SPEC), _build_codes(DC_CHROMA_SPEC)]
    ac_codes = _build_codes(PROG_AC_SPEC)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def dht(tclass, tid, spec):
        bits, values = spec
        return seg(0xC4, bytes([tclass << 4 | tid]) + bytes(bits[1:]) + bytes(values))

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(qy.ravel()[ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, b"\x01" + bytes(qc.ravel()[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, hv, tq in ((1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)):
        sof += bytes([cid, hv, tq])
    out += seg(0xC2, sof)  # SOF2: progressive DCT
    out += dht(0, 0, DC_LUMA_SPEC) + dht(0, 1, DC_CHROMA_SPEC)
    out += dht(1, 0, PROG_AC_SPEC)

    for comp_idx, ss, se, ah, al in PROG_SCRIPT:
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            td = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (td << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)

        writer = _BitWriter()
        if ss == 0 and ah == 0:  # DC first (interleaved MCU raster)
            prev = [0] * len(comp_idx)
            for by in range(bh):
                for bx in range(bw_):
                    for si, ci in enumerate(comp_idx):
                        v = int(qz[ci][by, bx, 0]) >> al  # arithmetic shift
                        diff = v - prev[si]
                        prev[si] = v
                        t, mag = _magnitude(diff)
                        code, ln = dc_codes[0 if ci == 0 else 1][t]
                        writer.write(code, ln)
                        if t:
                            writer.write(mag, t)
        elif ss == 0:  # DC refinement: one raw bit per block
            for by in range(bh):
                for bx in range(bw_):
                    for ci in comp_idx:
                        writer.write((int(qz[ci][by, bx, 0]) >> al) & 1, 1)
        else:  # AC scans: single component, raster over its blocks
            (ci,) = comp_idx
            st = _ProgACState(writer, ac_codes)
            for by in range(bh):
                for bx in range(bw_):
                    if ah == 0:
                        _encode_ac_first_block(st, qz[ci][by, bx], ss, se, al)
                    else:
                        _encode_ac_refine_block(st, qz[ci][by, bx], ss, se, al)
            st.flush_eobrun()
        out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)
