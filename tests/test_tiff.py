"""TIFF container codec + RAW-family header probe."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dataset_batch_processor_spark.multimodal import binary, tiff


def _rand(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_tiff_roundtrip():
    for h, w in ((1, 1), (7, 13), (20, 20)):
        arr = _rand(h, w, seed=h)
        assert np.array_equal(tiff.decode_tiff(tiff.encode_tiff(arr)), arr)


def test_tiff_probe_matches_decode():
    arr = _rand(9, 31)
    data = tiff.encode_tiff(arr)
    assert tiff.probe_tiff_dims(data) == (31, 9)


def test_compressed_tiff_quarantines_with_reason():
    data = bytearray(tiff.encode_tiff(_rand(4, 4)))
    # flip the Compression tag (259) value to 5 (LZW)
    n = struct.unpack("<H", data[8:10])[0]
    for i in range(n):
        e = 10 + 12 * i
        if struct.unpack("<H", data[e : e + 2])[0] == 259:
            data[e + 8 : e + 12] = struct.pack("<I", 5)
    with pytest.raises(NotImplementedError, match="compression 5"):
        tiff.decode_tiff(bytes(data))
    # the header probe still reads dims off the compressed container
    assert tiff.probe_tiff_dims(bytes(data)) == (4, 4)


def test_big_endian_probe():
    # minimal MM header + IFD with width/height only
    ifd = struct.pack(">H", 2)
    ifd += struct.pack(">HHII", 256, 4, 1, 123)
    ifd += struct.pack(">HHII", 257, 4, 1, 45)
    ifd += struct.pack(">I", 0)
    data = b"MM\x00*" + struct.pack(">I", 8) + ifd
    assert tiff.probe_tiff_dims(data) == (123, 45)


def test_registry_dng_routes_through_tiff():
    arr = _rand(6, 6)
    data = tiff.encode_tiff(arr)
    # uncompressed TIFF bytes with a .dng extension decode fine
    assert np.array_equal(binary.CODECS["dng"](data), arr)
    # sniffing: magic beats extension
    assert np.array_equal(binary.decode_any("xyz", data), arr)


def test_images_meta_probes_tiff(spark):
    from dataset_batch_processor_spark.sources import images

    assert images.parse_tiff_header(tiff.encode_tiff(_rand(11, 17))) == (17, 11)
    assert images.parse_tiff_header(b"not tiff") is None


def test_decode_16bit_tiff_top_byte_both_byte_orders():
    # round 8: 16-bit baseline TIFF tone-maps the top byte, honoring
    # the file byte order (hand-built II and MM containers)
    import struct as _struct

    rng = np.random.default_rng(8)
    h, w = 4, 5
    vals = rng.integers(0, 65536, (h, w)).astype(np.uint16)
    for bo, tag_pack, sample_dtype in (
        ("<", "<", "<u2"), (">", ">", ">u2"),
    ):
        payload = vals.astype(sample_dtype).tobytes()
        entries = [
            (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 16),
            (259, 3, 1, 1), (262, 3, 1, 1), (273, 4, 1, None),
            (277, 3, 1, 1), (279, 4, 1, len(payload)),
        ]
        ifd_off = 8
        data_off = ifd_off + 2 + 12 * len(entries) + 4
        head = b"II*\x00" if bo == "<" else b"MM\x00*"
        out = bytearray(head) + _struct.pack(tag_pack + "I", ifd_off)
        out += _struct.pack(tag_pack + "H", len(entries))
        for tag, typ, cnt, val in entries:
            if tag == 273:
                val = data_off
            if typ == 3:
                # SHORT value left-justified in the 4-byte field
                out += (
                    _struct.pack(tag_pack + "HHI", tag, typ, cnt)
                    + _struct.pack(tag_pack + "H", val)
                    + b"\x00\x00"
                )
            else:
                out += _struct.pack(tag_pack + "HHII", tag, typ, cnt, val)
        out += _struct.pack(tag_pack + "I", 0)
        out += payload
        dec = tiff.decode_tiff(bytes(out))
        assert np.array_equal(dec[:, :, 0], (vals >> 8).astype(np.uint8)), bo


def _build_tiff(bo, w, h, strips, entries_extra, bits=(8, 8, 8)):
    """Hand-build a classic TIFF: ``strips`` is a list of payload
    bytes (offsets/counts tags are generated), ``entries_extra``
    appends/overrides IFD entries as (tag, type, values)."""
    import struct as _struct

    base = {
        256: (3, [w]), 257: (3, [h]),
        258: (3, list(bits)), 259: (3, [1]), 262: (3, [2]),
        277: (3, [len(bits)]),
    }
    for tag, typ, vals in entries_extra:
        base[tag] = (typ, vals)
    base[279] = (4, [len(s) for s in strips])
    tags = sorted(base) + [273]
    n = len(tags)
    ifd_off = 8
    # external value area follows the IFD; strip data after it
    ext_off = ifd_off + 2 + 12 * n + 4
    ext = bytearray()
    fields = []
    for tag in tags:
        if tag == 273:
            typ, vals = 4, None  # filled after layout below
        else:
            typ, vals = base[tag]
        fields.append((tag, typ, vals))
    # two passes: place strip offsets once ext size (incl. the
    # offsets array itself when n_strips > 1) is known
    n_strips = len(strips)
    sizes = {3: 2, 4: 4}
    ext_size = 0
    for tag, typ, vals in fields:
        cnt = n_strips if tag == 273 else len(vals)
        if sizes[typ] * cnt > 4:
            ext_size += sizes[typ] * cnt
    data_off = ext_off + ext_size
    offs, pos = [], data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    out = bytearray(
        (b"II*\x00" if bo == "<" else b"MM\x00*")
        + _struct.pack(bo + "I", ifd_off)
    )
    out += _struct.pack(bo + "H", n)
    for tag, typ, vals in fields:
        if tag == 273:
            vals = offs
        cnt = len(vals)
        fmt = "H" if typ == 3 else "I"
        packed = _struct.pack(bo + fmt * cnt, *vals)
        if len(packed) <= 4:
            out += _struct.pack(bo + "HHI", tag, typ, cnt)
            out += packed + b"\x00" * (4 - len(packed))
        else:
            out += _struct.pack(
                bo + "HHII", tag, typ, cnt, ext_off + len(ext)
            )
            ext += packed
    out += _struct.pack(bo + "I", 0)
    out += ext
    for s in strips:
        out += s
    return bytes(out)


@pytest.mark.parametrize("bo", ["<", ">"])
def test_decode_planar_tiff_8bit(bo):
    # round 8: PlanarConfiguration=2 — all strips of plane 0, then
    # plane 1, then plane 2 (TIFF 6.0 p.68)
    rng = np.random.default_rng(42)
    h, w = 5, 7
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    strips = [np.ascontiguousarray(arr[:, :, c]).tobytes() for c in range(3)]
    data = _build_tiff(bo, w, h, strips, [(284, 3, [2]), (278, 3, [h])])
    assert np.array_equal(tiff.decode_tiff(data), arr)


def test_decode_planar_tiff_multistrip_and_16bit():
    rng = np.random.default_rng(7)
    h, w = 6, 4
    # 8-bit, 2 rows per strip -> 3 strips per plane, plane-major order
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    strips = [
        np.ascontiguousarray(arr[r : r + 2, :, c]).tobytes()
        for c in range(3)
        for r in range(0, h, 2)
    ]
    data = _build_tiff("<", w, h, strips, [(284, 3, [2]), (278, 3, [2])])
    assert np.array_equal(tiff.decode_tiff(data), arr)
    # 16-bit big-endian planar: top-byte tone map per plane
    v16 = rng.integers(0, 65536, (h, w, 3)).astype(np.uint16)
    strips16 = [
        np.ascontiguousarray(v16[:, :, c]).astype(">u2").tobytes()
        for c in range(3)
    ]
    data16 = _build_tiff(
        ">", w, h, strips16, [(284, 3, [2]), (278, 3, [h])],
        bits=(16, 16, 16),
    )
    assert np.array_equal(
        tiff.decode_tiff(data16), (v16 >> 8).astype(np.uint8)
    )


def test_planar_3plus_config_quarantines():
    data = bytearray(tiff.encode_tiff(_rand(3, 3)))
    # inject an unsupported PlanarConfiguration value via re-parse:
    # encode_tiff writes no 284 tag, so build one explicitly
    arr = _rand(3, 3, seed=5)
    strips = [np.ascontiguousarray(arr[:, :, c]).tobytes() for c in range(3)]
    bad = _build_tiff("<", 3, 3, strips, [(284, 3, [3])])
    with pytest.raises(NotImplementedError, match="planar configuration 3"):
        tiff.decode_tiff(bad)
