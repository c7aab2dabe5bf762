"""Pure-Python lossless JPEG (ITU-T T.81 process 14, SOF3).

The entropy layer of camera RAW: DNG's standard compression (tag
Compression=7) is lossless JPEG, and CR2/NEF lossless modes use the
same SOF3 scan machinery — it was the last reference-parity codec gap
(the reference decodes RAW via ``imageio.v3.imread``,
/root/reference/modules/other_tasks.py:45-51; extension list
filter_crop.py:39). Implemented from the public spec alone, in the
house pure-Python style (vp8.py, jpeg.py):

- **encode**: predictor 1..7, point transform 0, precision 2..16 bits,
  1..4 non-subsampled components interleaved in one scan. Huffman
  table is a fixed valid canonical code over SSSS 0..16 (Kraft sum
  1 - 2^-16, so the forbidden all-ones codeword is naturally unused).
- **decode**: DHT/SOF3/SOS parsing, byte-unstuffing bit reader,
  per-sample Huffman SSSS + EXTEND, modulo-2^16 prediction
  reconstruction (T.81 H.2). ROW-ALIGNED restart intervals (DRI with
  Ri a multiple of the scan width — how camera writers emit them) are
  honored: at each boundary the reader byte-aligns, consumes and
  sequence-checks RSTn, and prediction resets per T.81 H.1.1 (the
  interval's first line predicts from the left, its first sample from
  2^(P-Pt-1)). Non-row-aligned intervals quarantine with a precise
  reason rather than decoding with wrong resets.

Sample ordering and prediction (T.81 Annex H): prediction for the
first sample of the first line (and after a restart) is 2^(P-Pt-1);
the remaining samples of the first line predict from the left
neighbor regardless of selection; the first sample of every other
line predicts from above; each component predicts from its OWN plane
even when interleaved.
"""

from __future__ import annotations

import struct

import numpy as np

# Fixed canonical Huffman code for the 17 SSSS symbols: three 2-bit
# codes then one code per length 3..16. Kraft sum = 1 - 2^-16 < 1, a
# valid prefix code whose 16-bit codeword is not all ones.
_SSSS_LENGTHS = [2, 2, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]


def _canonical_codes(lengths: list[int]) -> list[tuple[int, int]]:
    """(code, length) per symbol index for canonical assignment in
    (length, symbol) order — symbols are already sorted by length."""
    codes = []
    code = 0
    prev_len = lengths[0]
    for ln in lengths:
        code <<= ln - prev_len
        codes.append((code, ln))
        code += 1
        prev_len = ln
    return codes


_ENC_CODES = _canonical_codes(_SSSS_LENGTHS)


def _dht_payload() -> bytes:
    """DHT segment payload for the fixed table (class 0, id 0)."""
    bits = [0] * 16
    for ln in _SSSS_LENGTHS:
        bits[ln - 1] += 1
    # symbols in (length, symbol) order == natural order here
    return bytes([0x00] + bits + list(range(17)))


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits (T.81 F.1.2.3)
        return bytes(self.out)

    def restart(self, n: int) -> None:
        """Byte-align (1-bit padding) and emit RSTn — the interval
        boundary framing of T.81 E.1.2."""
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (n & 7)])


class _BitReader:
    """MSB-first reader over entropy data with 0xFF00 unstuffing.
    Returns 1-bits past the end (T.81 F.2.2.5 padding convention,
    same policy as jpeg.py)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8
            return
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                # RSTn reached through bit refill = the decoder is
                # mid-interval (conforming streams only cross restart
                # boundaries via sync_restart, which consumes the
                # marker directly): the stream is corrupt or
                # non-conforming — raise instead of silently decoding
                # garbage from 1-padding until the next sequence check.
                raise ValueError(
                    "lossless JPEG: unexpected RSTn inside a restart "
                    "interval (corrupt or non-conforming stream)"
                )
            else:
                # EOI / any non-restart marker: end of entropy data,
                # pad 1s (T.81 F.2.2.5)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def sync_restart(self) -> int:
        """Discard buffered bits (byte padding — the encoder aligned
        before the marker, and _fill never consumes marker bytes, so
        everything buffered past the last decoded sample is pad) and
        consume the RSTn marker at the stream position. Returns n."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if (
            self.pos + 1 >= len(d)
            or d[self.pos] != 0xFF
            or not 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            raise ValueError("lossless JPEG: expected restart marker")
        n = d[self.pos + 1] - 0xD0
        self.pos += 2
        return n


def _extend(v: int, ssss: int) -> int:
    if ssss == 0:
        return 0
    if v < (1 << (ssss - 1)):
        return v - (1 << ssss) + 1
    return v


def _predict(
    plane: np.ndarray, y: int, x: int, sel: int, default: int, y0: int = 0,
) -> int:
    """Prediction per T.81 H.1/H.2. ``y0`` is the first row of the
    current restart interval: the interval's first line predicts from
    the left (its first sample from ``default``), exactly the
    start-of-scan rule re-applied at each restart (H.1.1)."""
    if y == y0 and x == 0:
        return default
    if y == y0:
        return int(plane[y, x - 1])
    if x == 0:
        return int(plane[y - 1, 0])
    a = int(plane[y, x - 1])
    b = int(plane[y - 1, x])
    c = int(plane[y - 1, x - 1])
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    if sel == 7:
        return (a + b) >> 1
    raise ValueError(f"lossless JPEG: predictor {sel} invalid")


def encode_ljpeg(
    arr: np.ndarray, precision: int | None = None, predictor: int = 1,
    restart_rows: int = 0,
) -> bytes:
    """(H, W) or (H, W, C<=4) unsigned integer array -> SOF3 stream.

    ``restart_rows`` > 0 writes a DRI segment (Ri = restart_rows *
    width MCUs — row-aligned, the camera convention) and emits RSTn
    every that many rows with per-interval prediction resets."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] > 4:
        raise ValueError("encode_ljpeg expects (H, W) or (H, W, C<=4)")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    if restart_rows < 0:
        raise ValueError("restart_rows must be >= 0")
    h, w, nc = arr.shape
    planes = arr.astype(np.int64)
    if precision is None:
        precision = max(2, int(planes.max()).bit_length())
    if not 2 <= precision <= 16:
        raise ValueError("precision must be 2..16")
    if int(planes.max()) >= 1 << precision or int(planes.min()) < 0:
        raise ValueError("samples out of range for precision")

    default = 1 << (precision - 1)
    bw = _BitWriter()
    y0 = 0
    n_rst = 0
    for y in range(h):
        if restart_rows and y and y % restart_rows == 0:
            bw.restart(n_rst % 8)
            n_rst += 1
            y0 = y
        for x in range(w):
            for ci in range(nc):
                px = _predict(
                    planes[:, :, ci], y, x, predictor, default, y0
                )
                diff = (int(planes[y, x, ci]) - px) & 0xFFFF
                if diff >= 0x8000:
                    sdiff = diff - 0x10000
                else:
                    sdiff = diff
                if sdiff == -32768:
                    ssss = 16
                else:
                    ssss = abs(sdiff).bit_length()
                code, ln = _ENC_CODES[ssss]
                bw.put(code, ln)
                if 0 < ssss < 16:
                    v = sdiff if sdiff >= 0 else sdiff + (1 << ssss) - 1
                    bw.put(v, ssss)
    entropy = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    dht = _dht_payload()
    out += b"\xff\xc4" + struct.pack(">H", len(dht) + 2) + dht
    if restart_rows:
        ri = restart_rows * w  # MCUs per interval (1 MCU = 1 sample/comp)
        if ri > 0xFFFF:
            raise ValueError("restart interval exceeds DRI range")
        out += b"\xff\xdd" + struct.pack(">HH", 4, ri)
    sof = struct.pack(">BHHB", precision, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", len(sof) + 2) + sof
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, 0x00])  # Ss=predictor, Se=0, Ah<<4|Al=0
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _parse_dht(payload: bytes, tables: dict) -> None:
    pos = 0
    while pos < len(payload):
        tc_th = payload[pos]
        bits = list(payload[pos + 1 : pos + 17])
        nsym = sum(bits)
        syms = list(payload[pos + 17 : pos + 17 + nsym])
        pos += 17 + nsym
        # canonical (length, order) -> (code, length) per symbol
        lut = {}
        code = 0
        i = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                lut[(code, ln)] = syms[i]
                code += 1
                i += 1
            code <<= 1
        tables[tc_th & 0x0F] = lut


def _read_symbol(br: _BitReader, lut: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bits(1)
        sym = lut.get((code, ln))
        if sym is not None:
            return sym
    raise ValueError("lossless JPEG: invalid Huffman code")


def decode_ljpeg(data: bytes) -> np.ndarray:
    """SOF3 stream -> (H, W, C) uint16 array (C as encoded)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    tables: dict[int, dict] = {}
    precision = h = w = 0
    comps: list[tuple[int, int]] = []  # (component id, table id)
    predictor = pt = 0
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("lossless JPEG: marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        payload = data[pos + 2 : pos + seglen]
        if marker == 0xC4:
            _parse_dht(payload, tables)
        elif marker == 0xC3:
            precision, h, w, nc = struct.unpack(">BHHB", payload[:6])
            # dims sanity before the sample-plane allocation: a
            # crafted SOF3 header claiming 65535x65535x4 would try a
            # ~137 GB allocation before any entropy byte is read;
            # cap matches rawvendor.MAX_RAW_PIXELS (268 MP), ~2.5x
            # the largest real sensor, counted across components
            if h <= 0 or w <= 0 or nc <= 0 or h * w * nc > 1 << 28:
                raise ValueError(
                    f"lossless JPEG: implausible frame dims "
                    f"{w}x{h}x{nc} (corrupt header)"
                )
            comp_ids = [payload[6 + 3 * i] for i in range(nc)]
            for i in range(nc):
                if payload[7 + 3 * i] != 0x11:
                    raise NotImplementedError(
                        "lossless JPEG: subsampled components unsupported"
                    )
            comps = [(cid, 0) for cid in comp_ids]
        elif marker in (0xC0, 0xC1, 0xC2, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "not a lossless (SOF3) JPEG — lossy processes are "
                "handled by multimodal/jpeg.py"
            )
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:
            ns = payload[0]
            scan = []
            for i in range(ns):
                cs = payload[1 + 2 * i]
                td = payload[2 + 2 * i] >> 4
                scan.append((cs, td))
            predictor = payload[1 + 2 * ns]
            pt = payload[3 + 2 * ns] & 0x0F
            # entropy data starts after this segment
            pos += seglen
            return _decode_scan(
                data, pos, tables, precision, h, w,
                [(cs, td) for cs, td in scan], predictor, pt,
                restart_interval,
            )
        pos += seglen
    raise ValueError("lossless JPEG: no SOS marker")


def _decode_scan(
    data: bytes, pos: int, tables: dict, precision: int, h: int, w: int,
    scan: list[tuple[int, int]], predictor: int, pt: int,
    restart_interval: int,
) -> np.ndarray:
    if restart_interval and restart_interval % w:
        # a boundary inside a row would make "first line of the
        # interval" ambiguous; camera writers align to rows, anything
        # else lands in the F7 quarantine rather than decoding with
        # wrong prediction resets
        raise NotImplementedError(
            "lossless JPEG: restart interval not row-aligned "
            f"(Ri={restart_interval}, width={w})"
        )
    restart_rows = restart_interval // w if restart_interval else 0
    nc = len(scan)
    planes = np.zeros((h, w, nc), dtype=np.int64)
    default = 1 << (precision - pt - 1)
    br = _BitReader(data, pos)
    luts = [tables[td] for _, td in scan]
    y0 = 0
    n_rst = 0
    for y in range(h):
        if restart_rows and y and y % restart_rows == 0:
            n = br.sync_restart()
            if n != n_rst % 8:
                raise ValueError(
                    f"lossless JPEG: restart marker out of sequence "
                    f"(got RST{n}, expected RST{n_rst % 8})"
                )
            n_rst += 1
            y0 = y
        for x in range(w):
            for ci in range(nc):
                ssss = _read_symbol(br, luts[ci])
                if ssss == 16:
                    diff = 32768
                else:
                    diff = _extend(br.bits(ssss), ssss) if ssss else 0
                px = _predict(planes[:, :, ci], y, x, predictor, default, y0)
                planes[y, x, ci] = (px + diff) & 0xFFFF
    mask = (1 << precision) - 1
    return (planes & mask).astype(np.uint16)
