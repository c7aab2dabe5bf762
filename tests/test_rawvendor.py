"""CR2/NEF container layer (multimodal/rawvendor.py): slice
arithmetic, bit packing, registry dispatch, and quarantine reasons.
Reference surface: the PIL/imageio RAW route at
/root/reference/modules/other_tasks.py:45-51 (extensions
filter_crop.py:39) — here re-built on the pure-Python SOF3 codec."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dataset_batch_processor_spark.multimodal import binary, rawvendor, tiff


def _rng():
    return np.random.default_rng(11)


def test_cr2_roundtrip_slices_components_predictors():
    rng = _rng()
    for h, w in [(8, 12), (16, 30), (11, 24), (5, 6)]:
        arr = rng.integers(0, 65536, size=(h, w)).astype(np.uint16)
        for ns in (1, 2, 3):
            for nc in (1, 2, 3):
                if w % nc:
                    continue
                data = rawvendor.encode_cr2_lossless(
                    arr, n_slices=ns, ncomp=nc, predictor=(ns + nc) % 7 + 1
                )
                dec = rawvendor.decode_cr2_lossless(data)
                assert np.array_equal(dec, arr), (h, w, ns, nc)


def test_cr2_slice_serialization_order():
    """The stream serializes slice 0 fully (all rows), then slice 1 —
    hand-unslice the SOF3 payload and compare (pins the dcraw-
    documented layout, not just self-consistency)."""
    arr = np.arange(6 * 9, dtype=np.uint16).reshape(6, 9) * 101 % 65536
    data = rawvendor.encode_cr2_lossless(
        arr.astype(np.uint16), n_slices=3, ncomp=1
    )
    (raw_ifd_off,) = struct.unpack("<I", data[12:16])
    tags, _ = tiff._read_ifd_at(data, "<", raw_ifd_off)
    from dataset_batch_processor_spark.multimodal import ljpeg

    o, c = int(tags[273][0]), int(tags[279][0])
    seg = ljpeg.decode_ljpeg(data[o : o + c]).reshape(-1)
    # widths 3,3,3: first 18 samples == columns 0-2 row-major
    assert np.array_equal(seg[:18], arr[:, 0:3].reshape(-1))
    assert np.array_equal(seg[18:36], arr[:, 3:6].reshape(-1))
    assert int(tags[rawvendor.CR2_SLICE_TAG][0]) == 2  # n_full


def test_cr2_bad_slices_and_magic_rejected():
    arr = np.zeros((4, 8), dtype=np.uint16)
    data = bytearray(rawvendor.encode_cr2_lossless(arr, n_slices=2))
    # corrupt the slice widths so they no longer cover the sensor
    idx = data.index(struct.pack("<HHH", 1, 4, 4))
    data[idx : idx + 6] = struct.pack("<HHH", 1, 4, 7)
    with pytest.raises(ValueError, match="slice widths"):
        rawvendor.decode_cr2_lossless(bytes(data))
    with pytest.raises(ValueError, match="not a CR2"):
        rawvendor.decode_cr2_lossless(tiff.encode_tiff(
            np.zeros((2, 2, 3), dtype=np.uint8)
        ))


def test_nef_roundtrip_all_bit_depths():
    rng = _rng()
    for h, w in [(8, 12), (16, 31), (3, 5)]:
        for bits in (12, 14, 16):
            arr = rng.integers(0, 1 << bits, size=(h, w)).astype(np.uint16)
            data = rawvendor.encode_nef_packed(arr, bits=bits)
            assert np.array_equal(rawvendor.decode_nef_packed(data), arr)


def test_nef_packing_is_big_endian_msb_first():
    """12-bit packing: two samples -> 3 bytes, MSB-first (TIFF-EP).
    0xABC, 0xDEF -> AB CD EF."""
    packed = rawvendor._pack_bits_be(
        np.array([0xABC, 0xDEF], dtype=np.uint16), 12
    )
    assert packed == bytes([0xAB, 0xCD, 0xEF])
    out = rawvendor._unpack_bits_be(packed, 2, 12)
    assert list(out) == [0xABC, 0xDEF]


def test_nef_subifd_walk_picks_largest_area():
    """IFD0 is a preview descriptor; the raw IFD behind tag 330 wins
    because its area is larger."""
    arr = _rng().integers(0, 4096, size=(10, 14)).astype(np.uint16)
    data = rawvendor.encode_nef_packed(arr, bits=12)
    bo = tiff._parse_header(data)
    (ifd0_off,) = struct.unpack("<I", data[4:8])
    tags0, _ = tiff._read_ifd_at(data, bo, ifd0_off)
    assert 330 in tags0 and 273 not in tags0
    assert np.array_equal(rawvendor.decode_nef_packed(data), arr)


def test_nef_nikon_compressed_quarantines_with_reason():
    arr = np.zeros((4, 4), dtype=np.uint16)
    data = bytearray(rawvendor.encode_nef_packed(arr, bits=16))
    idx = data.index(struct.pack("<HHI", 259, 3, 1))
    data[idx + 8 : idx + 10] = struct.pack("<H", 34713)
    with pytest.raises(NotImplementedError, match="rawpy"):
        rawvendor.decode_nef_packed(bytes(data))


def test_registry_dispatch_cr2_magic_nef_extension():
    from dataset_batch_processor_spark.multimodal import optional_codecs

    if {"cr2", "nef"} & set(optional_codecs.REGISTERED):
        pytest.skip(
            "optional RAW codec registered — registry no longer routes "
            "to the pure decoder this test pins (ADVICE r7)"
        )
    arr = (np.arange(16 * 30, dtype=np.uint16) * 97 % 65536).reshape(16, 30)
    cr2 = rawvendor.encode_cr2_lossless(arr.astype(np.uint16), n_slices=3)
    disp = binary.decode_any("bin", cr2)  # CR magic wins over extension
    assert disp.shape == (16, 30, 3)
    assert np.array_equal(disp[:, :, 0], (arr >> 8).astype(np.uint8))
    nef = rawvendor.encode_nef_packed(
        (arr % 4096).astype(np.uint16), bits=12
    )
    # generic TIFF sniff must NOT shadow the .nef extension
    disp2 = binary.decode_any("nef", nef)
    assert np.array_equal(disp2[:, :, 0], ((arr % 4096) >> 8).astype(np.uint8))
    # plain .tif still routes to the baseline TIFF decoder
    rgb = (np.arange(5 * 5 * 3) % 256).astype(np.uint8).reshape(5, 5, 3)
    assert np.array_equal(binary.decode_any("tif", tiff.encode_tiff(rgb)), rgb)


# ----------------------------------------------------------- ARW (r8)


@pytest.mark.parametrize("bits", [12, 14, 16])
@pytest.mark.parametrize("rps", [0, 1, 3, 5])
def test_arw_roundtrip_bits_and_strips(bits, rps):
    arr = _rng().integers(0, 1 << bits, size=(11, 7)).astype(np.uint16)
    b = rawvendor.encode_arw_uncompressed(arr, bits=bits, rows_per_strip=rps)
    assert np.array_equal(rawvendor.decode_arw(b), arr)


def test_arw_multistrip_strips_are_byte_aligned():
    # 5 cols x 12 bits x 3 rows = 180 bits = 22.5 bytes per strip: a
    # continuous-bitstream unpack would desync every strip after the
    # first (the ADVICE r7 failure mode, here pinned on the ARW path)
    arr = _rng().integers(0, 1 << 12, size=(10, 5)).astype(np.uint16)
    b = rawvendor.encode_arw_uncompressed(arr, bits=12, rows_per_strip=3)
    assert np.array_equal(rawvendor.decode_arw(b), arr)


def test_arw_16bit_is_little_endian_in_file():
    arr = np.array([[0x1234, 0xABCD]], dtype=np.uint16)
    b = rawvendor.encode_arw_uncompressed(arr, bits=16)
    assert b.endswith(b"\x34\x12\xcd\xab")  # II header -> LE samples
    assert np.array_equal(rawvendor.decode_arw(b), arr)


def test_arw_unknown_compression_quarantines_with_reason():
    arr = np.zeros((4, 4), dtype=np.uint16)
    data = bytearray(rawvendor.encode_arw_uncompressed(arr, bits=16))
    idx = data.index(struct.pack("<HHI", 259, 3, 1))
    data[idx + 8 : idx + 10] = struct.pack("<H", 7)  # not 1/32767
    with pytest.raises(NotImplementedError, match="compression 7"):
        rawvendor.decode_arw(bytes(data))


def test_arw2_sony_compressed_roundtrip():
    # data inside the exact subset: per-block spread < 0x80 so sh=0
    rng = _rng()
    base = rng.integers(0, 0x7FF - 130, size=(6, 1)).astype(np.uint16)
    arr = (base + rng.integers(0, 127, size=(6, 64))).astype(np.uint16)
    data = rawvendor.encode_arw_compressed(arr)
    assert np.array_equal(rawvendor.decode_arw(data), arr)


def test_arw2_block_layout_even_then_odd_columns():
    # span pixels 0..31: value = column index; even block first
    arr = np.arange(32, dtype=np.uint16).reshape(1, 32)
    payload = rawvendor._arw2_encode_payload(arr)
    assert len(payload) == 32
    evens = rawvendor._arw2_block_decode(payload[:16])
    odds = rawvendor._arw2_block_decode(payload[16:])
    assert evens == list(range(0, 32, 2))
    assert odds == list(range(1, 32, 2))


def test_arw2_shift_scaling_decodes_lossy_blocks():
    # spread >= 0x80 forces sh=1: deltas decode as (d7 << 1) + min,
    # clamped to 0x7ff — decode a hand-built block and check the
    # scaling arithmetic (the lossy path the encoder refuses)
    # spread 0xFF: 0x80 <= 0xFF -> sh=1 (and 0x100 > 0xFF stops it)
    block = bytearray(16)
    struct.pack_into("<I", block, 0, 0xFF | (0 << 11) | (0 << 22) | (1 << 26))
    # first delta slot (pixel 2) at bit 30: value 0x41 -> (0x41<<1)+0
    bit = 30
    word = struct.unpack("<H", block[bit >> 3 : (bit >> 3) + 2])[0]
    word |= (0x41 & 0x7F) << (bit & 7)
    struct.pack_into("<H", block, bit >> 3, word)
    out = rawvendor._arw2_block_decode(bytes(block))
    assert out[0] == 0xFF and out[1] == 0
    assert out[2] == (0x41 << 1)  # sh=1 scaling applied


def test_arw2_encoder_refuses_inexact_blocks():
    pix = [0] * 16
    pix[0] = 0x200  # spread forces sh >= 1
    pix[2] = 3      # odd delta not representable at sh=1
    with pytest.raises(ValueError, match="not exactly representable"):
        rawvendor._arw2_block_encode(pix)


def test_arw_registry_dispatch_not_shadowed_by_tiff_sniff():
    from dataset_batch_processor_spark.multimodal import optional_codecs

    if "arw" in optional_codecs.REGISTERED:
        pytest.skip("optional RAW codec claimed 'arw'")
    arr = (
        (np.arange(8 * 6) * 997 % 65536).astype(np.uint16).reshape(8, 6)
    )
    b = rawvendor.encode_arw_uncompressed(arr)
    disp = binary.decode_any("arw", b)
    assert np.array_equal(disp[:, :, 0], (arr >> 8).astype(np.uint8))


def test_nef_multistrip_unpacks_each_strip_independently():
    # Hand-build a 2-strip NEF whose strips are NOT sample-aligned:
    # 3 rows x 5 cols x 12 bits = 180 bits -> 23 bytes (4 pad bits).
    # Each strip must restart at its own byte boundary (TIFF 6.0 §3).
    arr = _rng().integers(0, 1 << 12, size=(6, 5)).astype(np.uint16)
    h, w, bits, rps = 6, 5, 12, 3
    p0 = rawvendor._pack_bits_be(arr[:3].reshape(-1), bits)
    p1 = rawvendor._pack_bits_be(arr[3:].reshape(-1), bits)
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, bits),
        (259, 3, 1, 1), (273, 4, 2, None), (277, 3, 1, 1),
        (278, 4, 1, rps), (279, 4, 2, None),
    ]
    ifd_off = 8
    arr_off = ifd_off + 2 + 12 * len(entries) + 4
    data_off = arr_off + 16
    out = bytearray(b"II*\x00") + struct.pack("<I", ifd_off)
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == 273:
            val = arr_off
        elif tag == 279:
            val = arr_off + 8
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += struct.pack("<II", data_off, data_off + len(p0))
    out += struct.pack("<II", len(p0), len(p1))
    out += p0 + p1
    assert np.array_equal(rawvendor.decode_nef_packed(bytes(out)), arr)


# ------------------------------------------- Nikon 34713 (round 8)


@pytest.mark.parametrize("bits", [12, 14])
def test_nef_compressed_roundtrip(bits):
    rng = _rng()
    for h, w in [(1, 1), (3, 5), (9, 13), (16, 31)]:
        arr = rng.integers(0, 1 << bits, size=(h, w)).astype(np.uint16)
        data = rawvendor.encode_nef_compressed(arr, bits=bits)
        assert np.array_equal(rawvendor.decode_nef_packed(data), arr)


def test_nef_compressed_goes_through_makernote_walk():
    arr = np.full((4, 6), 1234, dtype=np.uint16)
    data = rawvendor.encode_nef_compressed(arr, bits=12)
    bo = tiff._parse_header(data)
    (ifd0_off,) = struct.unpack("<I", data[4:8])
    tags0, _ = tiff._read_ifd_at(data, bo, ifd0_off)
    found = rawvendor._find_nikon_linearization(data, bo, tags0)
    assert found is not None
    table, tbo = found
    assert table[0] == 0x46 and tbo == "<"


def test_nef_compressed_without_makernote_quarantines():
    # packed container flipped to 34713 has no MakerNote -> precise
    # reason, not a crash (the F7 quarantine path)
    arr = np.zeros((4, 4), dtype=np.uint16)
    data = bytearray(rawvendor.encode_nef_packed(arr, bits=12))
    idx = data.index(struct.pack("<HHI", 259, 3, 1))
    data[idx + 8 : idx + 10] = struct.pack("<H", 34713)
    with pytest.raises(NotImplementedError, match="0x0096"):
        rawvendor.decode_nef_packed(bytes(data))


def test_nikon_trees_are_complete_prefix_codes():
    for counts, values in rawvendor.NIKON_TREES:
        assert sum(counts) == len(values)
        kraft = sum(
            n / (1 << length)
            for length, n in enumerate(counts, start=1)
        )
        assert kraft == 1.0  # complete code, no undecodable gaps


def test_nikon_lossy_shl_diff_arithmetic():
    # leaf 0x39: len 9, shl 3 -> diff = ((raw<<1)+1)<<3>>1, sign via
    # bit 8, negative branch subtracts (1<<9) with no -1 (shl != 0)
    r = rawvendor._RawBits(bytes([0b01000000]))  # raw 6 bits = 16
    d = rawvendor._nikon_diff_decode(r, 0x39)
    # pre-sign value ((16<<1)+1)<<3>>1 = 132: bit 8 clear -> negative
    # branch subtracts 1<<9 (no -1 because shl != 0)
    assert d == 132 - 512
    r2 = rawvendor._RawBits(bytes([0b11111100]))  # raw = 63
    d2 = rawvendor._nikon_diff_decode(r2, 0x39)
    assert d2 == 508  # ((63<<1)+1)<<3>>1, bit 8 set -> positive


def test_nikon_lin_parse_curve_and_split():
    # ver 0x44 0x20: step-interpolated curve + split row at offset 562
    table = bytearray(600)
    table[0], table[1] = 0x44, 0x20
    table[2:10] = struct.pack("<4H", 600, 600, 600, 600)
    pts = [0, 100, 200, 300, 4000]
    table[10:12] = struct.pack("<H", len(pts))
    table[12 : 12 + 10] = struct.pack("<5H", *pts)
    table[562:564] = struct.pack("<H", 7)
    tree, curve, split, maxv, vpred = rawvendor._nikon_lin_parse(
        bytes(table), 12, "<"
    )
    assert tree == 0 and split == 7 and vpred == [[600, 600], [600, 600]]
    step = 4096 // 4
    assert curve[0] == 0 and curve[step] == 100 and curve[2 * step] == 200
    assert curve[step // 2] == 50  # midpoint interpolation
    # lossless selects the lossless trees and keeps identity curve
    t12 = bytes([0x46, 0x30]) + struct.pack("<4H", 0, 0, 0, 0) + b"\x00" * 2
    tree12, c12, s12, m12, _ = rawvendor._nikon_lin_parse(t12, 12, "<")
    tree14, _, _, m14, _ = rawvendor._nikon_lin_parse(t12, 14, "<")
    assert (tree12, tree14) == (2, 5)
    assert (m12, m14) == (4096, 16384) and s12 == 0
    assert c12[1234] == 1234


# -------------------------------------- round-8 review regressions


def test_nef_16bit_samples_follow_file_byte_order():
    # II header -> little-endian 16-bit samples (TIFF 6.0); the old
    # encoder/decoder pair used big-endian inside an II file
    arr = np.array([[0x1234, 0xABCD]], dtype=np.uint16)
    data = rawvendor.encode_nef_packed(arr, bits=16)
    assert data.endswith(b"\x34\x12\xcd\xab")
    assert np.array_equal(rawvendor.decode_nef_packed(data), arr)


def test_nikon_truncated_lin_table_quarantines():
    arr = np.full((3, 4), 7, dtype=np.uint16)
    data = rawvendor.encode_nef_compressed(arr, bits=12)
    # shrink the linearization payload: find the MakerNote's embedded
    # IFD entry and cut its count to 4 bytes (vpred truncated)
    idx = data.index(struct.pack(
        "<HH", rawvendor.NIKON_LINEARIZATION_TAG, 7))
    trunc = bytearray(data)
    trunc[idx + 4 : idx + 8] = struct.pack("<I", 4)
    with pytest.raises(NotImplementedError, match="install rawpy"):
        rawvendor.decode_nef_packed(bytes(trunc))


def test_nikon_lossy_curve_large_csize_no_crash():
    # review finding: csize=3000 at 12 bits gives step=1 and used to
    # IndexError; the identity-prefilled interpolation handles it
    csize = 3000
    table = bytearray(12 + 2 * csize + 600)
    table[0], table[1] = 0x44, 0x20
    table[2:10] = struct.pack("<4H", 0, 0, 0, 0)
    table[10:12] = struct.pack("<H", csize)
    for i in range(csize):
        struct.pack_into("<H", table, 12 + 2 * i, i)
    struct.pack_into("<H", table, 562, 9)
    tree, curve, split, maxv, _ = rawvendor._nikon_lin_parse(
        bytes(table), 12, "<"
    )
    assert split == struct.unpack("<H", bytes(table[562:564]))[0]
    assert curve[100] == 100  # anchors: curve[i*1] = i (identity pts)


def test_nikon_lossy_curve_tail_uses_identity_neighbor():
    # anchors cover [0, (csize-1)*step]; past the last anchor the
    # interpolation's right neighbor is the identity-prefilled value
    # (the documented in-place recipe), not a clamped anchor
    # csize=34 at 12 bits: step = 4096//33 = 124, last anchor at
    # 33*124 = 4092 < 4095 — indices 4093..4095 interpolate against
    # the identity value at 4092+124 = 4216, not a clamped anchor
    csize, bits = 34, 12
    step = (1 << bits) // (csize - 1)
    pts = [min(i * 110, 0x3FFF) for i in range(csize)]
    table = bytearray(600)
    table[0], table[1] = 0x44, 0x20
    table[2:10] = struct.pack("<4H", 0, 0, 0, 0)
    table[10:12] = struct.pack("<H", csize)
    for i, p in enumerate(pts):
        struct.pack_into("<H", table, 12 + 2 * i, p)
    _, curve, _, _, _ = rawvendor._nikon_lin_parse(bytes(table), bits, "<")
    i = (csize - 1) * step + 2  # 4094, past the last anchor
    frac = i % step             # 2
    base = i - frac             # 4092, the last anchor
    expect = (pts[-1] * (step - frac) + (base + step) * frac) // step
    assert curve[i] == expect


def test_arw2_truncated_payload_raises():
    arr = np.zeros((2, 32), dtype=np.uint16)
    data = bytearray(rawvendor.encode_arw_compressed(arr))
    idx = data.index(struct.pack("<HHI", 279, 4, 1))
    data[idx + 8 : idx + 12] = struct.pack("<I", 40)  # < 2*32 bytes
    with pytest.raises(ValueError, match="truncated"):
        rawvendor.decode_arw(bytes(data))


def test_arw2_vectorized_payload_matches_scalar_blocks():
    # the payload decoder is vectorized over all blocks; pin it
    # against the scalar reference decoder on random bytes, which
    # include negative-spread and degenerate (imax==imin) blocks
    for seed in (5, 11, 99):
        r = np.random.default_rng(seed)
        h, w = 8, 96
        raw = r.integers(0, 256, size=h * w).astype(np.uint8).tobytes()
        vec = rawvendor._arw2_decode_payload(raw, h, w)
        pos = 0
        for row in range(h):
            for span in range(0, w, 32):
                for parity in (0, 1):
                    scalar = rawvendor._arw2_block_decode(
                        raw[pos : pos + 16]
                    )
                    pos += 16
                    assert (
                        list(vec[row, span + parity : span + 32 : 2])
                        == scalar
                    ), (seed, row, span, parity)


def test_raw_decoders_fail_controlled_on_fuzz():
    """Garbage, truncated, and dims-bombed containers must raise
    (any exception type is quarantine-safe — F7 catches broadly) but
    never hang or allocate gigabytes. The dims cap is the load-
    bearing part: a header claiming a multi-gigapixel sensor raises
    BEFORE allocation."""
    rng = np.random.default_rng(21)
    decoders = [
        rawvendor.decode_arw,
        rawvendor.decode_nef_packed,
        rawvendor.decode_cr2_lossless,
    ]
    for dec in decoders:
        for n in (0, 3, 16, 200):
            blob = rng.integers(0, 256, size=n).astype(np.uint8).tobytes()
            with pytest.raises(Exception):
                dec(blob)
    # truncation of valid containers at every-16-bytes granularity:
    # every cut MUST raise — the payload sits at the end of each
    # container, so any prefix is either a broken walk or a short
    # strip, and silent garbage decode is the failure mode this pins
    # (NEF-34713 detects it via the bit reader's overrun flag)
    arr = _rng().integers(0, 4096, size=(6, 8)).astype(np.uint16)
    for enc, dec in [
        (lambda a: rawvendor.encode_nef_packed(a, bits=12),
         rawvendor.decode_nef_packed),
        (lambda a: rawvendor.encode_arw_uncompressed(a, bits=12),
         rawvendor.decode_arw),
        (lambda a: rawvendor.encode_nef_compressed(a, bits=12),
         rawvendor.decode_nef_packed),
    ]:
        data = enc(arr)
        for cut in range(8, len(data) - 1, 16):
            with pytest.raises(Exception):
                dec(data[:cut])
    # dims bomb: header claims 65535 x 65535 (4.3 gigapixels)
    bomb = bytearray(rawvendor.encode_arw_uncompressed(arr, bits=12))
    for tag in (256, 257):
        idx = 8  # IFD0 then raw IFD both carry the dims; patch all
        while True:
            try:
                idx = bomb.index(struct.pack("<HHI", tag, 4, 1), idx)
            except ValueError:
                break
            bomb[idx + 8 : idx + 12] = struct.pack("<I", 65535)
            idx += 12
    with pytest.raises(ValueError, match="implausible"):
        rawvendor.decode_arw(bytes(bomb))


# ---------------------------------------- property tests (round 8)

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    base=st.integers(0, 0x7FF - 127),
    offs=st.lists(st.integers(0, 127), min_size=16, max_size=16),
)
def test_arw2_block_roundtrip_property(base, offs):
    # any block inside the exact subset (spread <= 127 -> sh=0) must
    # roundtrip bit-exactly through encode -> decode
    pix = [base + o for o in offs]
    out = rawvendor._arw2_block_decode(rawvendor._arw2_block_encode(pix))
    assert out == pix


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(
        st.integers(0, (1 << 12) - 1), min_size=1, max_size=48
    ),
    w=st.integers(1, 8),
)
def test_nef_compressed_roundtrip_property(data, w):
    h = max(1, len(data) // w)
    vals = (data * ((h * w) // len(data) + 1))[: h * w]
    arr = np.array(vals, dtype=np.uint16).reshape(h, w)
    enc = rawvendor.encode_nef_compressed(arr, bits=12)
    assert np.array_equal(rawvendor.decode_nef_packed(enc), arr)
