"""JPEG metadata scrub: segment walk correctness, GPS audit, byte
restoration, and the malformed-input contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dataset_batch_processor_spark.multimodal import jpeg, metascrub


def _jpg() -> bytes:
    y, x = np.mgrid[0:12, 0:16]
    arr = np.stack([x * 3, y * 4, x + y], axis=2).astype(np.uint8)
    return jpeg.encode_jpeg(arr, quality=85)


def test_scrub_restores_original_bytes():
    orig = _jpg()
    dirty = metascrub.inject_app1(orig, metascrub.build_exif_app1(7))
    clean, dropped, removed = metascrub.scrub_jpeg(dirty)
    assert clean == orig
    assert dropped == 1
    assert removed == metascrub.APP1_OVERHEAD + 7
    assert len(dirty) - len(clean) == removed


def test_gps_audit_before_and_after():
    dirty = metascrub.inject_app1(_jpg(), metascrub.build_exif_app1(0))
    before = metascrub.jpeg_metadata_flags(dirty)
    assert before == {"has_exif": True, "has_gps": True,
                      "n_meta_segments": 1, "trailing_bytes": 0}
    clean, _, _ = metascrub.scrub_jpeg(dirty)
    after = metascrub.jpeg_metadata_flags(clean)
    assert after == {"has_exif": False, "has_gps": False,
                     "n_meta_segments": 0, "trailing_bytes": 0}


def test_post_eoi_trailing_bytes_truncated_and_audited():
    """Appended thumbnails / editor junk after EOI is a real-world PII
    carrier: the scrub truncates it and the audit reports it (round 9;
    previously both stopped at SOS and the pair agreed, masking it)."""
    orig = _jpg()
    junk = b"SECRET-THUMBNAIL" + metascrub.build_exif_app1(0)
    dirty = orig + junk
    assert metascrub.jpeg_metadata_flags(dirty)["trailing_bytes"] == len(junk)
    clean, dropped, removed = metascrub.scrub_jpeg(dirty)
    assert clean == orig and dropped == 1 and removed == len(junk)
    assert metascrub.jpeg_metadata_flags(clean)["trailing_bytes"] == 0


def test_between_scan_metadata_dropped():
    """Segments located after the first SOS (as between progressive
    scans) are walked, audited, and scrubbed — entropy data with its
    stuffed 0xFF00 bytes is crossed, not blindly copied."""
    orig = _jpg()
    eoi_at = orig.rindex(b"\xff\xd9")
    com = b"\xff\xfe" + struct.pack(">H", 10) + b"secret!!"
    dirty = orig[:eoi_at] + com + orig[eoi_at:]
    flags = metascrub.jpeg_metadata_flags(dirty)
    assert flags["n_meta_segments"] == 1
    clean, dropped, removed = metascrub.scrub_jpeg(dirty)
    assert clean == orig and dropped == 1 and removed == len(com)
    assert b"secret" not in clean


def test_exif_without_gps_flags_correctly():
    # APP1 with an Exif TIFF whose IFD0 has only DateTime (no 34853)
    dt = b"2026:01:01 00:00:00\x00"
    t = bytearray(b"II*\x00") + struct.pack("<I", 8)
    t += struct.pack("<H", 1)
    t += struct.pack("<HHII", 306, 2, len(dt), 8 + 2 + 12 + 4)
    t += struct.pack("<I", 0) + dt
    payload = b"Exif\x00\x00" + bytes(t)
    dirty = metascrub.inject_app1(_jpg(), payload)
    flags = metascrub.jpeg_metadata_flags(dirty)
    assert flags["has_exif"] and not flags["has_gps"]


def test_com_segment_also_dropped():
    orig = _jpg()
    com = b"\xff\xfe" + struct.pack(">H", 10) + b"secret!!"
    dirty = orig[:2] + com + orig[2:]
    clean, dropped, removed = metascrub.scrub_jpeg(dirty)
    assert clean == orig and dropped == 1 and removed == 12
    assert b"secret" not in clean


def test_multiple_segments_all_dropped():
    orig = _jpg()
    dirty = metascrub.inject_app1(orig, metascrub.build_exif_app1(3))
    dirty = metascrub.inject_app1(dirty, metascrub.build_exif_app1(9))
    clean, dropped, _ = metascrub.scrub_jpeg(dirty)
    assert clean == orig and dropped == 2


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="no SOI"):
        metascrub.scrub_jpeg(b"PNG...")
    with pytest.raises(ValueError, match="no SOI"):
        metascrub.inject_app1(b"x", b"y")


# ------------------------------------------------------ property fuzz

from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(
    segs=st.lists(
        st.tuples(
            st.integers(min_value=0xE1, max_value=0xFE).filter(
                lambda m: 0xE1 <= m <= 0xEF or m == 0xFE
            ),
            st.binary(min_size=0, max_size=40),
        ),
        min_size=0,
        max_size=5,
    )
)
def test_scrub_restores_original_under_arbitrary_metadata(segs):
    """Inject ANY sequence of APPn/COM segments after SOI — the scrub
    must restore the original bytes exactly and count them all."""
    orig = _BASE_JPG
    dirty = orig
    for marker, body in segs:
        seg = bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body
        dirty = dirty[:2] + seg + dirty[2:]
    clean, dropped, removed = metascrub.scrub_jpeg(dirty)
    assert clean == orig
    assert dropped == len(segs)
    assert removed == sum(4 + len(b) for _, b in segs)


_BASE_JPG = _jpg()


def test_scrub_images_dataframe_operator(spark):
    from dataset_batch_processor_spark.multimodal import tiff as tiff_mod
    import numpy as np

    orig = _jpg()
    dirty = metascrub.inject_app1(orig, metascrub.build_exif_app1(5))
    tif = tiff_mod.encode_tiff(
        (np.arange(96, dtype=np.uint8) % 251).reshape(8, 4, 3)
    )
    df = spark.createDataFrame(
        [
            ("a", "jpg", bytearray(dirty)),
            ("b", "tiff", bytearray(tif)),
            ("c", "gif", bytearray(b"GIF89a")),
        ],
        "id string, fmt string, content binary",
    )
    rows = {r.id: r for r in metascrub.scrub_images(df).collect()}
    assert bytes(rows["a"].content) == orig and rows["a"].had_gps
    assert rows["a"].bytes_removed == metascrub.APP1_OVERHEAD + 5
    assert rows["b"].error is None and rows["b"].had_gps is False
    assert rows["c"].error is not None and "no scrubber" in rows["c"].error


def _tiff16(h=3, w=4) -> bytes:
    """Hand-built single-strip 16-bit grayscale little-endian TIFF."""
    vals = (np.arange(h * w, dtype=np.uint16) * 999).reshape(h, w)
    payload = vals.astype("<u2").tobytes()
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 16),
        (259, 3, 1, 1), (262, 3, 1, 1), (273, 4, 1, None),
        (277, 3, 1, 1), (279, 4, 1, len(payload)),
    ]
    data_off = 8 + 2 + 12 * len(entries) + 4
    out = bytearray(b"II*\x00") + struct.pack("<I", 8)
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == 273:
            val = data_off
        if typ == 3:  # SHORT left-justified in the 4-byte field
            out += (struct.pack("<HHI", tag, typ, cnt)
                    + struct.pack("<H", val) + b"\x00\x00")
        else:
            out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0) + payload
    return bytes(out)


def test_16bit_tiff_scrub_quarantined(spark):
    """The transcode scrub is 8-bit only: decode tone-maps 16-bit to
    the top byte, so a 16-bit TIFF must quarantine with a precise
    reason, not silently lose 8 bits of precision (round 9)."""
    df = spark.createDataFrame(
        [("d", "tiff", bytearray(_tiff16()))],
        "id string, fmt string, content binary",
    )
    row = metascrub.scrub_images(df).collect()[0]
    assert row.content is None and row.error is not None
    assert "precision" in row.error


def test_fill_bytes_and_standalone_markers_handled():
    """T.81 B.1.1.2: 0xFF fill bytes before a marker are legal and
    must not desync the walk; TEM/RSTn carry no length field."""
    orig = _jpg()
    # fill byte before an injected APP1 (after SOI): FF D8 FF FF E1 ...
    app1 = metascrub.build_exif_app1(2)
    seg = b"\xff" + b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    dirty = orig[:2] + seg + orig[2:]
    clean, dropped, removed = metascrub.scrub_jpeg(dirty)
    assert clean == orig and dropped == 1
    assert removed == len(seg)  # fill byte dies with its segment
    flags = metascrub.jpeg_metadata_flags(dirty)
    assert flags["has_exif"] and flags["has_gps"]
    # a standalone TEM marker between segments is copied through
    dirty2 = orig[:2] + b"\xff\x01" + orig[2:]
    clean2, dropped2, _ = metascrub.scrub_jpeg(dirty2)
    assert dropped2 == 0 and clean2 == dirty2


def test_truncated_segment_raises_not_silent():
    orig = _jpg()
    bad = orig[:2] + b"\xff\xe1\xff\xff" + b"xx"  # len 65535 >> file
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exceeds|truncated"):
        metascrub.scrub_jpeg(bad)


def test_headers_only_stream_still_quarantines():
    """Round-9 review fix: a JPEG cut before any SOS (headers only)
    must raise — the full-stream walk exhausting cleanly is not a
    successful scrub."""
    app0 = b"\xff\xe0" + struct.pack(">H", 6) + b"JF\x00\x00"
    with pytest.raises(ValueError, match="without SOS or EOI"):
        metascrub.scrub_jpeg(b"\xff\xd8" + app0)


def test_exif_orientation_parse_and_transform():
    """Tag-274 reader + the 8-case transform: every orientation
    round-trips (store the inverse-transformed image, normalize with
    the parsed tag, recover the upright original); absent tag -> 1."""
    from dataset_batch_processor_spark.multimodal import tiff as tiff_m

    img = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    inv = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}
    base = _jpg()
    for o in range(1, 9):
        stored = tiff_m.apply_exif_orientation(img, inv[o])
        assert np.array_equal(
            tiff_m.apply_exif_orientation(stored, o), img
        ), o
        dirty = metascrub.inject_app1(
            base, metascrub.build_orientation_app1(o)
        )
        assert metascrub.jpeg_orientation(dirty) == o
    assert metascrub.jpeg_orientation(base) == 1  # no Exif -> upright
    with pytest.raises(ValueError):
        metascrub.build_orientation_app1(9)
