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
