"""Image metadata PII scrub — the multimodal twin of textclean.

Web-scraped photos carry EXIF blocks with GPS positions, timestamps,
and device identifiers; every privacy-conscious training pipeline
strips them before the bytes enter a corpus (the image analogue of
the email/phone masking in textclean.scrub_pii). Two strategies,
both real:

* **JPEG: segment-level scrub** — walk the marker stream and drop
  APP1..APP15 and COM segments wholesale, copying everything else
  byte-identical. No recompression, zero generation loss: the
  entropy-coded image data is untouched (provable — the decoded
  pixels compare equal before/after).
* **TIFF: transcode scrub** — re-encode from decoded pixels via the
  repo's own canonical encoder, which by construction writes only
  the geometry tags (a rebuild-the-IFD rewrite would have to shift
  every strip/tile offset anyway, which IS a re-encode).

Also provides the audit side (`jpeg_metadata_flags`): does this file
carry an Exif APP1, and does that Exif carry a GPS IFD (tag 34853)?
— reusing tiff.py's IFD reader on the embedded TIFF body.

The gated query injects a deterministic Exif/GPS APP1 (built here,
fixed layout, doc_id-sized padding) into the repo's own JPEG output,
scrubs it, and hash-gates: GPS seen before, gone after, exactly the
injected bytes removed, decoded pixels bit-equal.
"""

from __future__ import annotations

import struct

from . import tiff as tiff_mod

SOI = b"\xff\xd8"


def build_exif_app1(pad: int = 0) -> bytes:
    """A minimal but well-formed Exif APP1 payload (after the FFE1
    marker + length): ``Exif\\0\\0`` + little-endian TIFF whose IFD0
    holds DateTime (306) and a GPS IFD pointer (34853); the GPS IFD
    holds lat/lon refs + rationals. ``pad`` trailing bytes model the
    maker-note slack real cameras leave; layout is fixed so the total
    size is ``APP1_OVERHEAD + pad``."""
    # --- fixed tail data ----------------------------------------
    datetime_ascii = b"2026:01:01 00:00:00\x00"  # 20 bytes, count 20
    lat = struct.pack("<6I", 37, 1, 46, 1, 30, 1)    # 37 deg 46'30"
    lon = struct.pack("<6I", 122, 1, 25, 1, 10, 1)   # 122 deg 25'10"
    # --- offsets (TIFF origin = start of the II header) ----------
    ifd0_off = 8
    ifd0_len = 2 + 2 * 12 + 4
    gps_off = ifd0_off + ifd0_len
    gps_len = 2 + 4 * 12 + 4
    dt_off = gps_off + gps_len
    lat_off = dt_off + len(datetime_ascii)
    lon_off = lat_off + len(lat)
    t = bytearray(b"II*\x00")
    t += struct.pack("<I", ifd0_off)
    t += struct.pack("<H", 2)  # IFD0: DateTime, GPSInfo
    t += struct.pack("<HHII", 306, 2, len(datetime_ascii), dt_off)
    t += struct.pack("<HHII", 34853, 4, 1, gps_off)
    t += struct.pack("<I", 0)
    t += struct.pack("<H", 4)  # GPS IFD: LatRef, Lat, LonRef, Lon
    t += struct.pack("<HHI4s", 1, 2, 2, b"N\x00\x00\x00")
    t += struct.pack("<HHII", 2, 5, 3, lat_off)
    t += struct.pack("<HHI4s", 3, 2, 2, b"E\x00\x00\x00")
    t += struct.pack("<HHII", 4, 5, 3, lon_off)
    t += struct.pack("<I", 0)
    t += datetime_ascii + lat + lon
    return b"Exif\x00\x00" + bytes(t) + b"\x20" * pad


# marker(2) + length(2) + 'Exif\0\0'(6) + the fixed TIFF body
APP1_OVERHEAD = 4 + len(build_exif_app1(0))


def inject_app1(jpg: bytes, payload: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (where cameras put it)."""
    if jpg[:2] != SOI:
        raise ValueError("not a JPEG (no SOI)")
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpg[:2] + seg + jpg[2:]


def _walk_jpeg(jpg: bytes):
    """Full-stream T.81 marker walk shared by scrub + audit (round 9:
    extended past SOS — progressive JPEGs carry DHT/SOS/APPn/COM
    segments BETWEEN scans, and appended-thumbnail/editor junk after
    EOI is a common real-world PII carrier; the old walk stopped at
    the first SOS and both were invisible).

    Yields ``(kind, start, end, marker, hdr)`` events covering every
    byte of ``jpg[2:]``:

    * ``'seg'``        — length-bearing segment; ``start`` includes any
      0xFF fill bytes (T.81 B.1.1.2), ``hdr`` is the marker's own 0xFF
      so the body is ``jpg[hdr+4:end]``.
    * ``'standalone'`` — TEM/RSTn outside entropy data (no length).
    * ``'entropy'``    — an entropy-coded span after an SOS; stuffed
      0xFF00 bytes and RST0–7 restart markers are interior to it.
    * ``'eoi'``        — the EOI marker.
    * ``'trailing'``   — bytes after EOI (thumbnails, editor junk).

    Desyncs raise ``ValueError`` — scrub callers quarantine rather
    than emit silently truncated bytes. A stream that ends inside
    entropy data without EOI yields the span and returns (decoders
    tolerate a missing EOI)."""
    n = len(jpg)
    i, in_scan = 2, False
    while i < n:
        if in_scan:
            s = i
            while i < n:
                if jpg[i] != 0xFF:
                    i += 1
                    continue
                if i + 1 >= n:  # lone 0xFF at EOF: entropy remainder
                    i = n
                    break
                nxt = jpg[i + 1]
                if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:  # stuffing/RSTn
                    i += 2
                    continue
                if nxt == 0xFF:  # fill-byte run before a marker
                    i += 1
                    continue
                break  # a real marker terminates the scan
            if i > s:
                yield ("entropy", s, i, None, None)
            in_scan = False
            continue
        if jpg[i] != 0xFF:
            raise ValueError("JPEG marker stream desynced")
        j = i  # skip fill bytes: any run of 0xFF before the code
        while j + 1 < n and jpg[j + 1] == 0xFF:
            j += 1
        if j + 1 >= n:
            raise ValueError("JPEG truncated inside a marker")
        m = jpg[j + 1]
        if m == 0xD9:  # EOI — then inspect what trails it
            yield ("eoi", i, j + 2, m, j)
            if j + 2 < n:
                yield ("trailing", j + 2, n, None, None)
            return
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # TEM / RSTn: standalone
            yield ("standalone", i, j + 2, m, j)
            i = j + 2
            continue
        if j + 4 > n:
            raise ValueError("JPEG truncated inside a segment header")
        seg_end = j + 2 + struct.unpack(">H", jpg[j + 2 : j + 4])[0]
        if seg_end > n:
            raise ValueError("JPEG segment length exceeds the file")
        yield ("seg", i, seg_end, m, j)
        i = seg_end
        if m == 0xDA:  # SOS header done; entropy data follows
            in_scan = True


def scrub_jpeg(jpg: bytes) -> tuple[bytes, int, int]:
    """Drop every APP1..APP15 and COM segment; keep all else
    byte-identical. Returns (clean, n_dropped, bytes_removed).
    APP0/JFIF survives (it is structural, not metadata).

    Round 9: the walk continues THROUGH entropy data (stuffed 0xFF00
    and RSTn are interior), so metadata segments between progressive
    scans are dropped too, and bytes trailing EOI (appended
    thumbnails/editor junk — a real-world PII carrier) are truncated
    and counted. Entropy-coded spans are copied verbatim: zero
    generation loss, provable by decoded-pixel equality."""
    if jpg[:2] != SOI:
        raise ValueError("not a JPEG (no SOI)")
    out = bytearray(SOI)
    dropped, removed = 0, 0
    saw_image = False  # an SOS (entropy data follows) or an EOI
    for kind, s, e, m, _hdr in _walk_jpeg(jpg):
        if kind == "eoi" or (kind == "seg" and m == 0xDA):
            saw_image = True
        if kind == "seg" and ((0xE1 <= m <= 0xEF) or m == 0xFE):
            dropped += 1  # APPn (n>=1) / COM
            removed += e - s  # fill bytes die with their segment
        elif kind == "trailing":
            dropped += 1
            removed += e - s
        else:
            out += jpg[s:e]
    if not saw_image:
        # headers-only stream (upload cut before the scan): emitting
        # it as a "clean" scrub would hand undecodable bytes
        # downstream with error=None — raise into the F7 quarantine,
        # matching the pre-round-9 walk's contract
        raise ValueError("JPEG ended without SOS or EOI")
    return bytes(out), dropped, removed


def jpeg_metadata_flags(jpg: bytes) -> dict:
    """Audit: {'has_exif': bool, 'has_gps': bool, 'n_meta_segments':
    int, 'trailing_bytes': int} — GPS detected by reading tag 34853
    out of the embedded TIFF with the shared IFD reader. Round 9: the
    same full-stream walk as scrub_jpeg, so between-scan metadata and
    post-EOI trailing bytes are visible to the audit (previously the
    scrub-then-audit pair agreed by both stopping at SOS, masking the
    leak). Tolerant: a desync stops the scan with flags reflecting
    what was seen."""
    has_exif = has_gps = False
    n_meta = trailing = 0
    try:
        for kind, s, e, m, hdr in _walk_jpeg(jpg):
            if kind == "trailing":
                trailing = e - s
            elif kind == "seg" and ((0xE1 <= m <= 0xEF) or m == 0xFE):
                n_meta += 1
                body = jpg[hdr + 4 : e]
                if m == 0xE1 and body[:6] == b"Exif\x00\x00":
                    has_exif = True
                    try:
                        tbody = body[6:]
                        bo = tiff_mod._parse_header(tbody)
                        tags = tiff_mod._read_ifd(tbody, bo)
                        has_gps = 34853 in tags
                    except Exception:  # noqa: BLE001 — malformed Exif
                        pass
    except ValueError:
        pass
    return {"has_exif": has_exif, "has_gps": has_gps,
            "n_meta_segments": n_meta, "trailing_bytes": trailing}


def scrub_images(df):
    """DataFrame form: (id, fmt, content) -> scrubbed content plus the
    audit columns. JPEG takes the segment-level scrub; TIFF-family
    takes the transcode scrub (decode + canonical re-encode, which
    writes only geometry tags) — 8-bit TIFF ONLY: the canonical
    encoder writes 8-bit samples, so a 16-bit input is quarantined
    with a precise reason rather than silently losing precision in a
    metadata-only operation (round 9). Anything else quarantines with
    a precise reason (F7 convention). Arrow-batched, no shuffle."""
    from collections.abc import Iterator

    import pandas as pd

    from . import tiff

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                rec = {"id": str(row.id), "content": None,
                       "bytes_removed": None, "had_gps": None,
                       "error": None}
                try:
                    fmt = row.fmt.lower()
                    raw = bytes(row.content)
                    if fmt in ("jpg", "jpeg"):
                        rec["had_gps"] = bool(
                            jpeg_metadata_flags(raw)["has_gps"]
                        )
                        clean, _n, removed = scrub_jpeg(raw)
                        rec["content"] = clean
                        rec["bytes_removed"] = int(removed)
                    elif fmt in ("tif", "tiff"):
                        bo = tiff._parse_header(raw)
                        tags = tiff._read_ifd(raw, bo)
                        rec["had_gps"] = bool(34853 in tags)
                        bits = [int(b) for b in tags.get(258, [8])
                                if isinstance(b, int)]
                        if any(b != 8 for b in bits):
                            # decode tone-maps 16-bit to the top byte
                            # and encode writes 8-bit — a transcode
                            # scrub would silently lose pixel
                            # precision in a metadata-only operation
                            raise NotImplementedError(
                                f"metadata scrub: {bits}-bit TIFF "
                                "transcode would lose pixel precision "
                                "(8-bit only); quarantined"
                            )
                        clean = tiff.encode_tiff(tiff.decode_tiff(raw))
                        rec["content"] = clean
                        rec["bytes_removed"] = int(len(raw) - len(clean))
                    else:
                        raise NotImplementedError(
                            f"metadata scrub: no scrubber for {fmt!r} "
                            "(JPEG segment walk and TIFF transcode only)"
                        )
                except Exception as e:  # noqa: BLE001 — quarantine
                    rec["error"] = f"{type(e).__name__}: {e}"
                out.append(rec)
            yield pd.DataFrame(
                out,
                columns=["id", "content", "bytes_removed", "had_gps",
                         "error"],
            )

    return df.select("id", "fmt", "content").mapInPandas(
        run,
        schema=("id string, content binary, bytes_removed int, "
                "had_gps boolean, error string"),
    )


# --------------------------------- EXIF orientation (round 9)
# Cameras store the sensor image unrotated and record how to display
# it in Exif tag 274; a training pipeline must NORMALIZE orientation
# before any geometric op (crops, tiles, augmentations) or 5/8 of
# phone photos come in sideways/mirrored. Builder + reader here (the
# IFD machinery lives in this module); the pixel transform is
# binary.apply_exif_orientation.


def build_orientation_app1(orientation: int) -> bytes:
    """Minimal well-formed Exif APP1 whose IFD0 holds ONLY tag 274
    (Orientation, SHORT, 1..8) — fixed layout, byte-deterministic."""
    if not 1 <= orientation <= 8:
        raise ValueError("EXIF orientation must be 1..8")
    t = bytearray(b"II*\x00")
    t += struct.pack("<I", 8)          # IFD0 offset
    t += struct.pack("<H", 1)          # one entry
    t += struct.pack("<HHI", 274, 3, 1)  # tag, SHORT, count 1
    t += struct.pack("<H", orientation) + b"\x00\x00"  # left-justified
    t += struct.pack("<I", 0)          # no next IFD
    return b"Exif\x00\x00" + bytes(t)


def jpeg_orientation(jpg: bytes) -> int:
    """Exif orientation (tag 274) from the first Exif APP1; 1 (upright)
    when absent or unreadable — the display default every viewer
    assumes."""
    for kind, _s, e, m, hdr in _walk_jpeg(jpg):
        if kind == "seg" and m == 0xE1:
            body = jpg[hdr + 4 : e]
            if body[:6] == b"Exif\x00\x00":
                try:
                    tbody = body[6:]
                    bo = tiff_mod._parse_header(tbody)
                    tags = tiff_mod._read_ifd(tbody, bo)
                    v = tags.get(274)
                    if v:
                        o = int(v[0])
                        if 1 <= o <= 8:
                            return o
                except Exception:  # noqa: BLE001 — malformed Exif
                    pass
        if kind == "seg" and m == 0xDA:
            break  # Exif precedes the scan
    return 1
