"""Oracle-checked multimodal query: proves the Arrow/mapInPandas
plumbing against a pure-SQL oracle.

The ``documents`` fixture has no binary column, so the query
manufactures one (utf-8 bytes of the text) and runs a DETERMINISTIC
fake decoder in a real mapInPandas kernel: the "decoded" dimensions
are pure functions of the byte length. The DuckDB oracle computes the
same functions from ``length(text)`` (the corpus is ascii, so
byte length == char length) — if the Arrow batch plumbing drops,
reorders, duplicates, or corrupts rows, the hash comparison catches
it. This is the strongest driver-visible check available for the
Python kernel path while real codecs are stubbed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog

DECODE_SCHEMA = "doc_id long, n_bytes int, fake_width int, fake_height int, checksum bigint"


def fake_decode_meta(binary_df: DataFrame) -> DataFrame:
    """mapInPandas kernel: deterministic dims + additive checksum from
    the payload bytes (the checksum touches every byte, so content
    corruption — not just length drift — would surface)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            blobs = pdf["content"].map(bytes)
            n = blobs.map(len).to_numpy(dtype=np.int64)
            # one Arrow-side concat + a single frombuffer/reduceat pass
            # (no per-row Python sum): additive checksum per blob
            joined = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            ends = np.cumsum(n)
            starts = ends - n
            # prefix-sum difference: exact per-blob sums, robust to
            # empty blobs anywhere in the batch
            csum = np.zeros(joined.size + 1, dtype=np.int64)
            np.cumsum(joined, out=csum[1:])
            sums = csum[ends] - csum[starts]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                    "n_bytes": n.astype(np.int32),
                    "fake_width": (n % 100 + 1).astype(np.int32),
                    "fake_height": (n // 100 + 1).astype(np.int32),
                    "checksum": sums,
                }
            )

    return binary_df.mapInPandas(run, schema=DECODE_SCHEMA)


def _q_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.load_table(spark, sf_dir, "documents")
    binary = docs.select("doc_id", F.encode("text", "utf-8").alias("content"))
    return fake_decode_meta(binary)


# ascii corpus: byte length == char length; checksum == sum of ascii
# codes, computable in SQL via the same posexplode-free char trick
DECODE_META_DUCK = """
WITH chars AS (
  SELECT doc_id, len(text) AS n,
         list_sum(list_transform(string_split(text, ''), c -> ascii(c))) AS cks
  FROM documents
)
SELECT doc_id,
       CAST(n AS INT) AS n_bytes,
       CAST(n % 100 + 1 AS INT) AS fake_width,
       CAST(n // 100 + 1 AS INT) AS fake_height,
       CAST(cks AS BIGINT) AS checksum
FROM chars
"""

def _fanout(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """doc_id-only fan-out ahead of a CPU-bound Python kernel.

    The documents scan is one small parquet file -> 1-2 input
    partitions, so without this every codec kernel below runs on one
    or two cores (mm_jpeg_roundtrip measured 13.2 s at sf0.1 that
    way). Repartitioning JUST the 8-byte ids costs a trivial shuffle
    and spreads the per-row encode/decode across all slots — the same
    shape a 1000-executor decode stage needs, where the scan
    parallelism (file count) and the kernel parallelism (CPU) are
    unrelated quantities."""
    return docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )


# -------------------------------------------------- real-codec roundtrip
# Unlike mm_decode_meta's fake decoder, this drives the REAL PNG codec
# (multimodal/png.py) under the driver's hash gate: each doc_id yields a
# deterministic gradient image, encoded with filter type doc_id % 5 (so
# all five PNG filters are exercised), decoded back through the codec
# registry, and checksummed pixel-by-pixel. The DuckDB oracle recomputes
# the checksum in closed form — a hash match proves the encode -> decode
# roundtrip preserved every pixel of every image.

PNG_ROUNDTRIP_SCHEMA = "doc_id long, width int, height int, pix_sum bigint"


def _q_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import binary, png

    docs = _fanout(spark, catalog.load_table(spark, sf_dir, "documents"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 16 + 4, d % 13 + 4
                y, x, c = np.mgrid[0:h, 0:w, 0:3]
                arr = ((d + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)
                data = png.encode_png(arr, filter_type=d % 5)
                dec = binary.decode_any("png", data)
                out.append(
                    {
                        "doc_id": d,
                        "width": int(dec.shape[1]),
                        "height": int(dec.shape[0]),
                        "pix_sum": int(dec.astype(np.int64).sum()),
                    }
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "pix_sum"]
            )

    return docs.mapInPandas(run, schema=PNG_ROUNDTRIP_SCHEMA)


PNG_ROUNDTRIP_DUCK = """
SELECT doc_id,
       CAST(doc_id % 16 + 4 AS INT) AS width,
       CAST(doc_id % 13 + 4 AS INT) AS height,
       CAST(list_sum(list_transform(generate_series(0, doc_id % 13 + 3), y ->
         list_sum(list_transform(generate_series(0, doc_id % 16 + 3), x ->
           list_sum(list_transform([0,1,2], c ->
             (doc_id + 3*x + 7*y + 11*c) % 256)))))) AS BIGINT) AS pix_sum
FROM documents
"""

# Adam7 variant of the PNG roundtrip (VERDICT r6 next#2): same
# closed-form gradient, but encoded INTERLACED with filter doc_id % 5,
# and dims run down to 1x1 (w in 1..16, h in 1..13) so geometries with
# EMPTY interlace passes (w<5 kills pass 2, h<5 kills pass 3, ...) are
# all under the hash gate, not just the happy path. The oracle is the
# same pixel-sum recomputation — interlacing must be a pure byte-layout
# change, invisible in decoded pixels.


def _q_png_interlaced_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import binary, png

    docs = _fanout(spark, catalog.load_table(spark, sf_dir, "documents"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 16 + 1, d % 13 + 1
                y, x, c = np.mgrid[0:h, 0:w, 0:3]
                arr = ((d + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)
                data = png.encode_png(arr, filter_type=d % 5, interlace=True)
                dec = binary.decode_any("png", data)
                out.append(
                    {
                        "doc_id": d,
                        "width": int(dec.shape[1]),
                        "height": int(dec.shape[0]),
                        "pix_sum": int(dec.astype(np.int64).sum()),
                    }
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "pix_sum"]
            )

    return docs.mapInPandas(run, schema=PNG_ROUNDTRIP_SCHEMA)


PNG_INTERLACED_ROUNDTRIP_DUCK = """
SELECT doc_id,
       CAST(doc_id % 16 + 1 AS INT) AS width,
       CAST(doc_id % 13 + 1 AS INT) AS height,
       CAST(list_sum(list_transform(generate_series(0, doc_id % 13), y ->
         list_sum(list_transform(generate_series(0, doc_id % 16), x ->
           list_sum(list_transform([0,1,2], c ->
             (doc_id + 3*x + 7*y + 11*c) % 256)))))) AS BIGINT) AS pix_sum
FROM documents
"""

# WAV analogue of the PNG roundtrip: deterministic int16 ramp per doc,
# encoded to real RIFF/PCM bytes (stdlib wave), decoded back through
# the audio codec registry, sample-sum checksummed; DuckDB recomputes
# the checksum in closed form. Hash match == every sample survived the
# encode -> decode roundtrip.

WAV_ROUNDTRIP_SCHEMA = (
    "doc_id long, sample_rate int, n_samples int, sample_sum bigint"
)


def _q_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import av

    docs = _fanout(spark, catalog.load_table(spark, sf_dir, "documents"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 500 + 100
                i = np.arange(n, dtype=np.int64)
                samples = ((d * 31 + i * 7) % 65536 - 32768).astype(np.int16)
                data = av.encode_wav(samples, sample_rate=16_000)
                dec, rate = av.AUDIO_CODECS["wav"](data)
                out.append(
                    {
                        "doc_id": d,
                        "sample_rate": int(rate),
                        "n_samples": int(len(dec)),
                        "sample_sum": int(dec.astype(np.int64).sum()),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "sample_rate", "n_samples", "sample_sum"],
            )

    return docs.mapInPandas(run, schema=WAV_ROUNDTRIP_SCHEMA)


WAV_ROUNDTRIP_DUCK = """
SELECT doc_id,
       CAST(16000 AS INT) AS sample_rate,
       CAST(doc_id % 500 + 100 AS INT) AS n_samples,
       CAST(list_sum(list_transform(generate_series(0, doc_id % 500 + 99),
              i -> (doc_id * 31 + i * 7) % 65536 - 32768)) AS BIGINT)
           AS sample_sum
FROM documents
"""

# JPEG is lossy, so (unlike PNG/WAV) the oracle can't recompute pixel
# sums — instead the Spark kernel asserts the reconstruction-error
# bound per image (same pattern as the HLL sketch oracle): dims must
# match exactly, max|decoded - original| <= 8 at quality 85 on smooth
# gradients. The codec is fully deterministic, so the booleans are
# stable and the hash gate makes this a real per-row check.

JPEG_ROUNDTRIP_SCHEMA = (
    "doc_id long, width int, height int, within_tol boolean"
)


def _q_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import binary, jpeg

    docs = _fanout(spark, catalog.load_table(spark, sf_dir, "documents"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 24 + 8, d % 17 + 8
                y, x = np.mgrid[0:h, 0:w]
                # smooth ramps only (no modular wrap): wrap edges ring
                # under DCT quantization and break the error bound
                arr = np.stack(
                    [x * 3 + d % 100, y * 4 + d % 80, x + y + d % 50],
                    axis=2,
                ).astype(np.uint8)
                dec = binary.decode_any("jpg", jpeg.encode_jpeg(arr, quality=85))
                err = int(np.abs(dec.astype(int) - arr.astype(int)).max())
                out.append(
                    {
                        "doc_id": d,
                        "width": int(dec.shape[1]),
                        "height": int(dec.shape[0]),
                        "within_tol": bool(err <= 8),
                    }
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "within_tol"]
            )

    return docs.mapInPandas(run, schema=JPEG_ROUNDTRIP_SCHEMA)


JPEG_ROUNDTRIP_DUCK = """
SELECT doc_id,
       CAST(doc_id % 24 + 8 AS INT) AS width,
       CAST(doc_id % 17 + 8 AS INT) AS height,
       TRUE AS within_tol
FROM documents
"""

# Progressive (SOF2) variant: same gradient fixture family, encoded
# with the T.81 Annex G scan script (DC/AC first + successive-
# approximation refinement, EOB runs) and decoded through the
# progressive scan assembler. The strongest available invariant rides
# along: the progressive and BASELINE encoders share the quant
# pipeline, so both streams must decode bit-identically (prog_eq_base)
# — hash-gated per row, not just an error bound.

PROG_ROUNDTRIP_SCHEMA = (
    "doc_id long, width int, height int, within_tol boolean, prog_eq_base boolean"
)


def _q_progressive_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import binary, jpeg

    docs = _fanout(spark, catalog.load_table(spark, sf_dir, "documents"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 21 + 6, d % 15 + 6
                y, x = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [x * 3 + d % 100, y * 4 + d % 80, x + y + d % 50],
                    axis=2,
                ).astype(np.uint8)
                prog = binary.decode_any(
                    "jpg", jpeg.encode_jpeg_progressive(arr, quality=85)
                )
                base = binary.decode_any(
                    "jpg", jpeg.encode_jpeg(arr, quality=85)
                )
                err = int(np.abs(prog.astype(int) - arr.astype(int)).max())
                out.append(
                    {
                        "doc_id": d,
                        "width": int(prog.shape[1]),
                        "height": int(prog.shape[0]),
                        "within_tol": bool(err <= 8),
                        "prog_eq_base": bool(np.array_equal(prog, base)),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "within_tol",
                         "prog_eq_base"],
            )

    return docs.mapInPandas(run, schema=PROG_ROUNDTRIP_SCHEMA)


PROG_ROUNDTRIP_DUCK = """
SELECT doc_id,
       CAST(doc_id % 21 + 6 AS INT) AS width,
       CAST(doc_id % 15 + 6 AS INT) AS height,
       TRUE AS within_tol,
       TRUE AS prog_eq_base
FROM documents
"""

# Resize stage under the hash gate: decode (real PNG codec) ->
# nearest-neighbor resize to a fixed 8x8 thumbnail (binary.
# resize_nearest: src row = y*h//8, src col = x*w//8 — pure integer
# index math) -> re-encode -> decode -> checksum. The DuckDB oracle
# replays the same integer index arithmetic in closed form over the
# deterministic gradient, so a hash match proves decode, the resize
# kernel's index selection, AND the second encode/decode roundtrip.

RESIZE_ROUNDTRIP_SCHEMA = "doc_id long, width int, height int, pix_sum bigint"

RESIZE_OUT = 8


def _q_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import binary, png

    docs = _fanout(spark, catalog.load_table(spark, sf_dir, "documents"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 16 + 4, d % 13 + 4
                y, x, c = np.mgrid[0:h, 0:w, 0:3]
                arr = ((d + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)
                small = binary.resize_nearest(
                    binary.decode_any("png", png.encode_png(arr)),
                    RESIZE_OUT,
                    RESIZE_OUT,
                )
                dec = binary.decode_any("png", png.encode_png(small))
                out.append(
                    {
                        "doc_id": d,
                        "width": int(dec.shape[1]),
                        "height": int(dec.shape[0]),
                        "pix_sum": int(dec.astype(np.int64).sum()),
                    }
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "pix_sum"]
            )

    return docs.mapInPandas(run, schema=RESIZE_ROUNDTRIP_SCHEMA)


RESIZE_ROUNDTRIP_DUCK = f"""
SELECT doc_id,
       CAST({RESIZE_OUT} AS INT) AS width,
       CAST({RESIZE_OUT} AS INT) AS height,
       CAST(list_sum(list_transform(generate_series(0, {RESIZE_OUT - 1}), y ->
         list_sum(list_transform(generate_series(0, {RESIZE_OUT - 1}), x ->
           list_sum(list_transform([0,1,2], c ->
             (doc_id + 3 * ((x * (doc_id % 16 + 4)) // {RESIZE_OUT})
                     + 7 * ((y * (doc_id % 13 + 4)) // {RESIZE_OUT})
                     + 11 * c) % 256)))))) AS BIGINT) AS pix_sum
FROM documents
"""

# WebP analogue of the PNG roundtrip: VP8L is lossless, so the DuckDB
# oracle recomputes the pixel checksum in closed form; a hash match
# proves encode_webp -> (registry-sniffed) decode preserved every
# pixel. Alternates the subtract-green transform by doc parity so
# both encoder paths run under the driver gate.

WEBP_ROUNDTRIP_SCHEMA = "doc_id long, width int, height int, pix_sum bigint"


def _q_webp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import binary, webp

    docs = _fanout(spark, catalog.load_table(spark, sf_dir, "documents"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 11 + 3, d % 7 + 3
                y, x, c = np.mgrid[0:h, 0:w, 0:3]
                arr = ((d + 5 * x + 9 * y + 13 * c) % 256).astype(np.uint8)
                data = webp.encode_webp(arr, subtract_green=bool(d % 2))
                dec = binary.decode_any("xyz", data)  # sniffed, not ext
                out.append(
                    {
                        "doc_id": d,
                        "width": int(dec.shape[1]),
                        "height": int(dec.shape[0]),
                        "pix_sum": int(dec.astype(np.int64).sum()),
                    }
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "pix_sum"]
            )

    return docs.mapInPandas(run, schema=WEBP_ROUNDTRIP_SCHEMA)


WEBP_ROUNDTRIP_DUCK = """
SELECT doc_id,
       CAST(doc_id % 11 + 3 AS INT) AS width,
       CAST(doc_id % 7 + 3 AS INT) AS height,
       CAST(list_sum(list_transform(generate_series(0, doc_id % 7 + 2), y ->
         list_sum(list_transform(generate_series(0, doc_id % 11 + 2), x ->
           list_sum(list_transform([0,1,2], c ->
             (doc_id + 5*x + 9*y + 13*c) % 256)))))) AS BIGINT) AS pix_sum
FROM documents
"""

# Tile MATERIALIZATION (G1b) under the hash gate: the pixel stage that
# tile_grid computes geometry for. Per doc: deterministic gradient ->
# real PNG encode -> tile_grid geometry (the same operator the tile_grid
# queries verify) -> materialize_tiles (registry decode, crop, Extend
# Edges pad, rawrgb re-encode) -> rawrgb decode -> per-tile pixel sum.
# The DuckDB oracle reuses tile_grid_sql for the geometry and replays
# crop+edge-pad in closed form: pixel (y,x,c) of the padded tile is the
# gradient at (min(top+ty, bottom-1), min(left+tx, right-1)) — edge
# replication IS coordinate clamping to the crop box.

TILE_CK = 4  # tile size; overlap 0.5 -> step 2

TILE_CK_SCHEMA = "doc_id long, i int, j int, tile_w int, tile_h int, pix_sum bigint"


# ------------------------------------------------- VP8 lossy roundtrip
# Same pattern for the VP8 (RFC 6386) keyframe codec: a deterministic
# smooth fixture per doc_id, encoded at a doc-dependent quantizer with
# the 4x4 (B_PRED) path exercised on three of every four docs, decoded
# back through the pure-Python decoder. The hash-gated invariant is the
# strongest the codec defines: the decoder's YUV planes must equal the
# encoder's own reconstruction BIT-FOR-BIT (recon_exact) — the same
# equality the libwebp interop tests in tests/test_vp8.py pin against
# the reference implementation — plus a quality bound vs the source.

VP8_ROUNDTRIP_SCHEMA = (
    "doc_id long, width int, height int, recon_exact boolean, "
    "within_tol boolean, anmf_exact boolean"
)


def _q_vp8_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """...plus the S5 animated-lossy corner (round 9, VERDICT r8 next
    #8): every stream is ALSO wrapped as the first ANMF frame of an
    animated WebP container and decoded through webp.decode_webp —
    ``anmf_exact`` gates that the container walk routes an
    ANMF-wrapped VP8 (not just VP8L) payload to the keyframe decoder
    bit-exactly."""
    import struct as _struct

    import numpy as np

    from . import vp8, webp

    docs = _fanout(spark, catalog.load_table(spark, sf_dir, "documents"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 24 + 16, d % 17 + 16
                y, x = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [x * 3 + d % 100, y * 4 + d % 80, x + y + d % 50], axis=2
                ).astype(np.uint8)
                stream, recon = vp8.encode_vp8_with_recon(
                    arr, qi=20 + d % 30, bpred_every=d % 4
                )
                dec = vp8.decode_vp8_yuv(stream)
                exact = all(
                    np.array_equal(a, b) for a, b in zip(dec, recon)
                )
                ysrc, _, _ = vp8.rgb_to_yuv420(arr)
                err = int(np.abs(dec[0].astype(int) - ysrc.astype(int)).max())
                # animated-WebP first frame: ANMF(16-byte header + VP8)
                frame = b"VP8 " + _struct.pack("<I", len(stream)) + stream
                if len(stream) & 1:
                    frame += b"\x00"
                anmf_payload = bytes(16) + frame
                anmf = (b"ANMF" + _struct.pack("<I", len(anmf_payload))
                        + anmf_payload)
                body = b"WEBP" + anmf
                riff = b"RIFF" + _struct.pack("<I", len(body)) + body
                anmf_rgb = webp.decode_webp(riff)
                anmf_exact = bool(
                    np.array_equal(anmf_rgb, vp8.yuv420_to_rgb(*recon))
                )
                out.append(
                    {
                        "doc_id": d,
                        "width": w,
                        "height": h,
                        "recon_exact": bool(exact),
                        "within_tol": bool(err <= 24),
                        "anmf_exact": anmf_exact,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "recon_exact",
                         "within_tol", "anmf_exact"],
            )

    return docs.mapInPandas(run, schema=VP8_ROUNDTRIP_SCHEMA)


VP8_ROUNDTRIP_DUCK = """
SELECT doc_id,
       CAST(doc_id % 24 + 16 AS INT) AS width,
       CAST(doc_id % 17 + 16 AS INT) AS height,
       TRUE AS recon_exact,
       TRUE AS within_tol,
       TRUE AS anmf_exact
FROM documents
"""


# --------------------------------------------- HEIC/AVIF roundtrip
# The reference's iPhone-dump format driven END TO END through the
# system libheif binding (optional_codecs.libheif_encode_rgb +
# registry decode): per doc, encode the deterministic smooth fixture
# with the library's HEVC encoder AND its AV1 encoder, decode both
# through decode_any, and gate dims + a lossy tolerance (worst
# measured error over the fixture id lattice is 6/255 at quality 95;
# the bound is 12). Requires the system libheif the driver container
# ships — on an install without it the codecs raise into quarantine
# and this row goes red, which is the honest signal (the capability
# genuinely is absent there). Every 8th doc only: x265 costs
# ~100-200 ms per call under full-width contention (it is a video
# encoder), and a capability gate needs coverage of the id lattice,
# not the whole corpus (measured 33 s unsampled -> ~4 s at sf0.1).

HEIF_ROUNDTRIP_SCHEMA = (
    "doc_id long, width int, height int, heic_ok boolean, avif_ok boolean"
)


def _q_heif_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import binary
    from . import optional_codecs as oc

    docs = _fanout(
        spark,
        catalog.load_table(spark, sf_dir, "documents").filter("doc_id % 8 = 0"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 24 + 16, d % 17 + 16
                y, x = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [x * 3 + d % 100, y * 4 + d % 80, x + y + d % 50], axis=2
                ).astype(np.uint8)
                oks = {}
                for fmt in ("heic", "avif"):
                    dec = binary.decode_any(
                        fmt, oc.libheif_encode_rgb(arr, fmt, quality=95)
                    )
                    err = int(np.abs(dec.astype(int) - arr.astype(int)).max())
                    oks[fmt] = dec.shape == arr.shape and err <= 12
                out.append(
                    {
                        "doc_id": d,
                        "width": w,
                        "height": h,
                        "heic_ok": bool(oks["heic"]),
                        "avif_ok": bool(oks["avif"]),
                    }
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "heic_ok", "avif_ok"]
            )

    return docs.mapInPandas(run, schema=HEIF_ROUNDTRIP_SCHEMA)


HEIF_ROUNDTRIP_DUCK = """
SELECT doc_id,
       CAST(doc_id % 24 + 16 AS INT) AS width,
       CAST(doc_id % 17 + 16 AS INT) AS height,
       TRUE AS heic_ok,
       TRUE AS avif_ok
FROM documents
WHERE doc_id % 8 = 0
"""


# ----------------------------------- EXIF orientation probe + apply
# The rotate/mirror metadata every photo ingest must honor BEFORE any
# geometry math (tile grids, crops): tag 274 written into a real
# lossless-JPEG DNG, probed back header-only (S2 family), the decoded
# pixels re-laid by the standard 8-case transform, and the result
# pinned by a POSITION-WEIGHTED checksum — a plain pixel sum is
# permutation-invariant and would pass with the transform completely
# wrong; the weighted sum replays the exact output arrangement in SQL.

EXIF_ORIENT_SCHEMA = (
    "doc_id long, orientation int, out_w int, out_h int, "
    "probe_ok boolean, wsum bigint"
)


def _q_exif_orientation(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import tiff

    docs = _fanout(
        spark,
        catalog.load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 3 == 0
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                o = d % 8 + 1
                w, h = d % 9 + 6, d % 7 + 5
                sy, sx = np.mgrid[0:h, 0:w]
                arr = ((d * 3 + sx * 7 + sy * 13) % 251).astype(np.uint16)
                dng = tiff.encode_dng_lossless(
                    arr, predictor=d % 7 + 1, orientation=o
                )
                probed = tiff.probe_tiff_orientation(dng)
                dec = tiff.decode_dng_lossless(dng)[:, :, 0]
                up = tiff.apply_exif_orientation(dec, probed)
                oh, ow = up.shape
                weights = (
                    np.arange(oh)[:, None] * ow + np.arange(ow)[None, :] + 1
                )
                out.append({
                    "doc_id": d,
                    "orientation": o,
                    "out_w": int(ow),
                    "out_h": int(oh),
                    "probe_ok": bool(probed == o),
                    "wsum": int((weights * up.astype(np.int64)).sum()),
                })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "orientation", "out_w", "out_h",
                         "probe_ok", "wsum"],
            )

    return docs.mapInPandas(run, schema=EXIF_ORIENT_SCHEMA)


# source coords per EXIF case (out(y,x) <- src(sy,sx)); 5-8 swap dims
_EXIF_SY = """CASE o
  WHEN 1 THEN y.y WHEN 2 THEN y.y
  WHEN 3 THEN h - 1 - y.y WHEN 4 THEN h - 1 - y.y
  WHEN 5 THEN x.x WHEN 6 THEN h - 1 - x.x
  WHEN 7 THEN h - 1 - x.x WHEN 8 THEN x.x END"""
_EXIF_SX = """CASE o
  WHEN 1 THEN x.x WHEN 2 THEN w - 1 - x.x
  WHEN 3 THEN w - 1 - x.x WHEN 4 THEN x.x
  WHEN 5 THEN y.y WHEN 6 THEN y.y
  WHEN 7 THEN w - 1 - y.y WHEN 8 THEN w - 1 - y.y END"""

EXIF_ORIENT_DUCK = f"""
WITH base AS (
  SELECT doc_id,
         doc_id % 8 + 1 AS o,
         doc_id % 9 + 6 AS w,
         doc_id % 7 + 5 AS h
  FROM documents WHERE doc_id % 3 = 0
),
dims AS (
  SELECT *,
         CASE WHEN o >= 5 THEN h ELSE w END AS ow,
         CASE WHEN o >= 5 THEN w ELSE h END AS oh
  FROM base
)
SELECT doc_id,
       CAST(o AS INT) AS orientation,
       CAST(ow AS INT) AS out_w,
       CAST(oh AS INT) AS out_h,
       TRUE AS probe_ok,
       CAST((
         SELECT sum(
           (y.y * ow + x.x + 1)
           * ((doc_id * 3 + ({_EXIF_SX}) * 7 + ({_EXIF_SY}) * 13) % 251)
         )
         FROM (SELECT unnest(generate_series(0, oh - 1)) AS y) y,
              (SELECT unnest(generate_series(0, ow - 1)) AS x) x
       ) AS BIGINT) AS wsum
FROM dims
"""
# Camera-RAW entropy layer (T.81 process 14 / SOF3, multimodal/
# ljpeg.py) driven end-to-end through the DNG container: per doc a
# deterministic 16-bit pattern (1..3 components, every predictor 1..7
# exercised across the id lattice) is encoded with OUR encoder into a
# Compression=7 DNG, decoded back, and gated on (a) BIT-EXACT
# equality — the defining property of a lossless process — and (b) a
# pixel checksum the DuckDB oracle recomputes in closed form from the
# pattern, so a decoder that silently returned the wrong pixels could
# not hash green even if it returned exact=TRUE.

DNG_ROUNDTRIP_SCHEMA = (
    "doc_id long, width int, height int, n_comp int, "
    "lossless_exact boolean, pix_sum bigint"
)


def _q_dng_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import tiff

    docs = _fanout(
        spark,
        catalog.load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 4 == 0
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, nc = d % 13 + 8, d % 11 + 8, d % 3 + 1
                y, x, c = np.mgrid[0:h, 0:w, 0:nc]
                arr = ((d * 7 + x * 257 + y * 1031 + c * 4099) % 65536
                       ).astype(np.uint16)
                dng = tiff.encode_dng_lossless(arr, predictor=d % 7 + 1)
                dec = tiff.decode_dng_lossless(dng)
                out.append({
                    "doc_id": d,
                    "width": w,
                    "height": h,
                    "n_comp": nc,
                    "lossless_exact": bool(np.array_equal(dec, arr)),
                    "pix_sum": int(dec.astype(np.int64).sum()),
                })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "n_comp",
                         "lossless_exact", "pix_sum"],
            )

    return docs.mapInPandas(run, schema=DNG_ROUNDTRIP_SCHEMA)


DNG_ROUNDTRIP_DUCK = """
SELECT doc_id,
       CAST(doc_id % 13 + 8 AS INT) AS width,
       CAST(doc_id % 11 + 8 AS INT) AS height,
       CAST(doc_id % 3 + 1 AS INT) AS n_comp,
       TRUE AS lossless_exact,
       CAST((
         SELECT sum((doc_id * 7 + x.x * 257 + y.y * 1031 + c.c * 4099)
                    % 65536)
         FROM (SELECT unnest(generate_series(0, doc_id % 13 + 7)) AS x) x,
              (SELECT unnest(generate_series(0, doc_id % 11 + 7)) AS y) y,
              (SELECT unnest(generate_series(0, doc_id % 3)) AS c) c
       ) AS BIGINT) AS pix_sum
FROM documents
WHERE doc_id % 4 = 0
"""


# Tiled-DNG variant (VERDICT r6 next#3): the layout real cameras ship.
# Same bit-exact + closed-form-checksum gate as mm_dng_lossless_roundtrip,
# but the container writes TileWidth/TileLength/TileOffsets/TileByteCounts
# (TIFF 6.0 §15) with per-doc geometry spanning image-smaller-than-tile,
# exact-multiple, and clipped-edge cases, and tile size alternating
# 16x16 / 32x16. n_tiles is recomputed by the oracle so a decoder that
# ignored the grid could not hash green.

DNG_TILED_SCHEMA = (
    "doc_id long, width int, height int, n_comp int, n_tiles int, "
    "lossless_exact boolean, pix_sum bigint"
)


def _q_dng_tiled_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import tiff

    docs = _fanout(
        spark,
        catalog.load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 5 == 0
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, nc = d % 37 + 10, d % 29 + 10, d % 3 + 1
                tw = 16 if d % 2 == 0 else 32
                y, x, c = np.mgrid[0:h, 0:w, 0:nc]
                arr = ((d * 7 + x * 257 + y * 1031 + c * 4099) % 65536
                       ).astype(np.uint16)
                dng = tiff.encode_dng_lossless(
                    arr, predictor=d % 7 + 1, tile=(tw, 16)
                )
                dec = tiff.decode_dng_lossless(dng)
                out.append({
                    "doc_id": d,
                    "width": w,
                    "height": h,
                    "n_comp": nc,
                    "n_tiles": ((w + tw - 1) // tw) * ((h + 15) // 16),
                    "lossless_exact": bool(np.array_equal(dec, arr)),
                    "pix_sum": int(dec.astype(np.int64).sum()),
                })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "n_comp", "n_tiles",
                         "lossless_exact", "pix_sum"],
            )

    return docs.mapInPandas(run, schema=DNG_TILED_SCHEMA)


DNG_TILED_DUCK = """
SELECT doc_id,
       CAST(doc_id % 37 + 10 AS INT) AS width,
       CAST(doc_id % 29 + 10 AS INT) AS height,
       CAST(doc_id % 3 + 1 AS INT) AS n_comp,
       CAST(
         ((doc_id % 37 + 10 + CASE WHEN doc_id % 2 = 0 THEN 15 ELSE 31 END)
            // CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 32 END)
         * ((doc_id % 29 + 25) // 16)
       AS INT) AS n_tiles,
       TRUE AS lossless_exact,
       CAST((
         SELECT sum((doc_id * 7 + x.x * 257 + y.y * 1031 + c.c * 4099)
                    % 65536)
         FROM (SELECT unnest(generate_series(0, doc_id % 37 + 9)) AS x) x,
              (SELECT unnest(generate_series(0, doc_id % 29 + 9)) AS y) y,
              (SELECT unnest(generate_series(0, doc_id % 3)) AS c) c
       ) AS BIGINT) AS pix_sum
FROM documents
WHERE doc_id % 5 = 0
"""


# Vendor-RAW container walks (VERDICT r6 next#1, closing S4): the
# sliced-CR2 and packed-NEF decoders (multimodal/rawvendor.py) driven
# end-to-end on self-produced bytes, bit-exact + closed-form checksum —
# the exact pattern that proved the DNG path. CR2 varies slice count
# 1..3, interleave 1..2 components, and every predictor; NEF varies
# 12/14/16-bit packing. A decoder that mis-unsliced or mis-unpacked a
# single sample could not hash green.

CR2_ROUNDTRIP_SCHEMA = (
    "doc_id long, width int, height int, n_slices int, "
    "lossless_exact boolean, pix_sum bigint"
)


def _q_cr2_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import binary, optional_codecs, rawvendor

    docs = _fanout(
        spark,
        catalog.load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 4 == 1
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                h, w = d % 21 + 6, 2 * (d % 17 + 4)
                ns, nc = d % 3 + 1, d % 2 + 1
                y, x = np.mgrid[0:h, 0:w]
                arr = ((d * 7 + x * 263 + y * 1021) % 65536).astype(
                    np.uint16
                )
                # every third doc adds row-aligned restart markers, so
                # the DRI/RSTn machinery sits under the hash gate too
                cr2 = rawvendor.encode_cr2_lossless(
                    arr, n_slices=ns, ncomp=nc, predictor=d % 7 + 1,
                    restart_rows=(d % 3 + 2) if d % 3 == 0 else 0,
                )
                dec = rawvendor.decode_cr2_lossless(cr2)
                # exactness gate is the pure decoder (deterministic on
                # every install); the registry-path assertion only runs
                # when 'cr2' still routes to it — optional rawpy/
                # imageio codecs demosaic real CR2s and would reject or
                # re-tone this synthetic minimal container (ADVICE r7)
                ok = bool(np.array_equal(dec, arr))
                if "cr2" not in optional_codecs.REGISTERED:
                    disp = binary.decode_any("bin", cr2)
                    ok = ok and bool(
                        np.array_equal(
                            disp[:, :, 0], (arr >> 8).astype(np.uint8)
                        )
                    )
                out.append({
                    "doc_id": d,
                    "width": w,
                    "height": h,
                    "n_slices": ns,
                    "lossless_exact": ok,
                    "pix_sum": int(dec.astype(np.int64).sum()),
                })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "n_slices",
                         "lossless_exact", "pix_sum"],
            )

    return docs.mapInPandas(run, schema=CR2_ROUNDTRIP_SCHEMA)


CR2_ROUNDTRIP_DUCK = """
SELECT doc_id,
       CAST(2 * (doc_id % 17 + 4) AS INT) AS width,
       CAST(doc_id % 21 + 6 AS INT) AS height,
       CAST(doc_id % 3 + 1 AS INT) AS n_slices,
       TRUE AS lossless_exact,
       CAST((
         SELECT sum((doc_id * 7 + x.x * 263 + y.y * 1021) % 65536)
         FROM (SELECT unnest(generate_series(0, 2 * (doc_id % 17 + 4) - 1))
               AS x) x,
              (SELECT unnest(generate_series(0, doc_id % 21 + 5)) AS y) y
       ) AS BIGINT) AS pix_sum
FROM documents
WHERE doc_id % 4 = 1
"""


NEF_ROUNDTRIP_SCHEMA = (
    "doc_id long, width int, height int, bits int, "
    "lossless_exact boolean, sample_sum bigint"
)


def _q_nef_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import rawvendor

    docs = _fanout(
        spark,
        catalog.load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 4 == 2
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                h, w = d % 19 + 5, d % 23 + 5
                bits = (12, 14, 16)[d % 3]
                y, x = np.mgrid[0:h, 0:w]
                arr = ((d * 11 + x * 157 + y * 331) % (1 << bits)).astype(
                    np.uint16
                )
                nef = rawvendor.encode_nef_packed(arr, bits=bits)
                dec = rawvendor.decode_nef_packed(nef)
                out.append({
                    "doc_id": d,
                    "width": w,
                    "height": h,
                    "bits": bits,
                    "lossless_exact": bool(np.array_equal(dec, arr)),
                    "sample_sum": int(dec.astype(np.int64).sum()),
                })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "bits",
                         "lossless_exact", "sample_sum"],
            )

    return docs.mapInPandas(run, schema=NEF_ROUNDTRIP_SCHEMA)


NEF_ROUNDTRIP_DUCK = """
SELECT doc_id,
       CAST(doc_id % 23 + 5 AS INT) AS width,
       CAST(doc_id % 19 + 5 AS INT) AS height,
       CAST(CASE doc_id % 3 WHEN 0 THEN 12 WHEN 1 THEN 14 ELSE 16 END
            AS INT) AS bits,
       TRUE AS lossless_exact,
       CAST((
         SELECT sum((doc_id * 11 + x.x * 157 + y.y * 331)
                    % (1 << CASE doc_id % 3 WHEN 0 THEN 12
                            WHEN 1 THEN 14 ELSE 16 END))
         FROM (SELECT unnest(generate_series(0, doc_id % 23 + 4)) AS x) x,
              (SELECT unnest(generate_series(0, doc_id % 19 + 4)) AS y) y
       ) AS BIGINT) AS sample_sum
FROM documents
WHERE doc_id % 4 = 2
"""


PNG_DEPTHS_SCHEMA = (
    "doc_id long, depth int, ctype int, interlaced boolean, "
    "lossless_exact boolean, pix_sum bigint"
)


def _q_png_depths_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-depth PNG coverage (round 8): every spec-valid depth
    branch — 1/2/4-bit gray (scaled to 8-bit like PIL convert('L')),
    4-bit palette, 16-bit gray and RGB (top-byte tone map) — each
    encoded with encode_png_ex, decoded through the REGISTRY path,
    compared against the closed-form expected display, at both
    sequential and Adam7 interlace. A mis-unpacked bit plane, wrong
    scale factor, or palette mis-index cannot hash green."""
    import numpy as np

    from . import binary

    docs = _fanout(
        spark,
        catalog.load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 3 == 1
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import png as pngmod

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                h, w = d % 11 + 3, d % 9 + 3
                branch = d % 6
                interlace = bool(d % 2)
                y, x = np.mgrid[0:h, 0:w]
                base = d * 13 + x * 29 + y * 53
                if branch <= 2:          # sub-byte gray
                    depth, ctype = (1, 2, 4)[branch], 0
                    v = (base % (1 << depth)).astype(np.uint8)
                    data = pngmod.encode_png_ex(
                        v, depth=depth, ctype=ctype, interlace=interlace
                    )
                    disp = (
                        v.astype(np.uint16) * 255 // ((1 << depth) - 1)
                    ).astype(np.uint8)
                    expect = np.repeat(disp[:, :, None], 3, axis=2)
                elif branch == 3:        # 4-bit palette
                    depth, ctype = 4, 3
                    idx = (base % 16).astype(np.uint8)
                    plte = np.stack(
                        [((d * 7 + np.arange(16) * 31) % 256)] * 3, axis=1
                    ).astype(np.uint8)
                    data = pngmod.encode_png_ex(
                        idx, depth=depth, ctype=ctype, plte=plte,
                        interlace=interlace,
                    )
                    expect = plte[idx]
                elif branch == 4:        # 16-bit gray
                    depth, ctype = 16, 0
                    v = (base % 65536).astype(np.uint16)
                    data = pngmod.encode_png_ex(
                        v, depth=depth, ctype=ctype, interlace=interlace
                    )
                    expect = np.repeat(
                        (v >> 8).astype(np.uint8)[:, :, None], 3, axis=2
                    )
                else:                    # 16-bit RGB
                    depth, ctype = 16, 2
                    c = np.arange(3)
                    v = (
                        (base[:, :, None] + c * 77) % 65536
                    ).astype(np.uint16)
                    data = pngmod.encode_png_ex(
                        v, depth=depth, ctype=ctype, interlace=interlace
                    )
                    expect = (v >> 8).astype(np.uint8)
                dec = binary.decode_any("png", data)
                out.append({
                    "doc_id": d,
                    "depth": depth,
                    "ctype": ctype,
                    "interlaced": interlace,
                    "lossless_exact": bool(np.array_equal(dec, expect)),
                    "pix_sum": int(dec.astype(np.int64).sum()),
                })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "depth", "ctype", "interlaced",
                         "lossless_exact", "pix_sum"],
            )

    return docs.mapInPandas(run, schema=PNG_DEPTHS_SCHEMA)


PNG_DEPTHS_DUCK = """
SELECT doc_id,
       CAST(CASE doc_id % 6 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4
            WHEN 3 THEN 4 ELSE 16 END AS INT) AS depth,
       CAST(CASE WHEN doc_id % 6 = 3 THEN 3
                 WHEN doc_id % 6 = 5 THEN 2 ELSE 0 END AS INT) AS ctype,
       doc_id % 2 = 1 AS interlaced,
       TRUE AS lossless_exact,
       CAST((
         SELECT sum(CASE
           WHEN doc_id % 6 <= 2 THEN
             3 * (((doc_id * 13 + x.x * 29 + y.y * 53)
                   % (1 << (CASE doc_id % 6 WHEN 0 THEN 1
                            WHEN 1 THEN 2 ELSE 4 END))) * 255
                  // ((1 << (CASE doc_id % 6 WHEN 0 THEN 1
                             WHEN 1 THEN 2 ELSE 4 END)) - 1))
           WHEN doc_id % 6 = 3 THEN
             3 * ((doc_id * 7
                   + ((doc_id * 13 + x.x * 29 + y.y * 53) % 16) * 31)
                  % 256)
           WHEN doc_id % 6 = 4 THEN
             3 * (((doc_id * 13 + x.x * 29 + y.y * 53) % 65536) // 256)
           ELSE
             ((doc_id * 13 + x.x * 29 + y.y * 53) % 65536) // 256
             + ((doc_id * 13 + x.x * 29 + y.y * 53 + 77) % 65536) // 256
             + ((doc_id * 13 + x.x * 29 + y.y * 53 + 154) % 65536) // 256
         END)
         FROM (SELECT unnest(generate_series(0, doc_id % 9 + 2)) AS x) x,
              (SELECT unnest(generate_series(0, doc_id % 11 + 2)) AS y) y
       ) AS BIGINT) AS pix_sum
FROM documents
WHERE doc_id % 3 = 1
"""


NEFC_ROUNDTRIP_SCHEMA = (
    "doc_id long, width int, height int, bits int, "
    "lossless_exact boolean, sample_sum bigint"
)


def _q_nef_compressed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nikon-compressed NEF (Compression 34713, VERDICT r7 next#6)
    end-to-end: the encoder emits the lossless configuration
    (ver 0x46 linearization table inside a real MakerNote walk:
    IFD0 -> ExifIFD -> MakerNote -> embedded TIFF -> tag 0x0096),
    the decoder Huffman-decodes the vendor diff stream through
    decode_nef_packed's container dispatch — so the MakerNote walk,
    the canonical tree, the dual vertical seed predictors, and the
    diff arithmetic all sit under the hash gate, at both 12- and
    14-bit precision."""
    import numpy as np

    from . import rawvendor

    docs = _fanout(
        spark,
        catalog.load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 5 == 4
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                h, w = d % 15 + 4, d % 19 + 4
                bits = (12, 14)[d % 2]
                y, x = np.mgrid[0:h, 0:w]
                arr = ((d * 17 + x * 101 + y * 577) % (1 << bits)).astype(
                    np.uint16
                )
                nef = rawvendor.encode_nef_compressed(arr, bits=bits)
                dec = rawvendor.decode_nef_packed(nef)
                out.append({
                    "doc_id": d,
                    "width": w,
                    "height": h,
                    "bits": bits,
                    "lossless_exact": bool(np.array_equal(dec, arr)),
                    "sample_sum": int(dec.astype(np.int64).sum()),
                })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "bits",
                         "lossless_exact", "sample_sum"],
            )

    return docs.mapInPandas(run, schema=NEFC_ROUNDTRIP_SCHEMA)


NEFC_ROUNDTRIP_DUCK = """
SELECT doc_id,
       CAST(doc_id % 19 + 4 AS INT) AS width,
       CAST(doc_id % 15 + 4 AS INT) AS height,
       CAST(CASE doc_id % 2 WHEN 0 THEN 12 ELSE 14 END AS INT) AS bits,
       TRUE AS lossless_exact,
       CAST((
         SELECT sum((doc_id * 17 + x.x * 101 + y.y * 577)
                    % (1 << CASE doc_id % 2 WHEN 0 THEN 12 ELSE 14 END))
         FROM (SELECT unnest(generate_series(0, doc_id % 19 + 3)) AS x) x,
              (SELECT unnest(generate_series(0, doc_id % 15 + 3)) AS y) y
       ) AS BIGINT) AS sample_sum
FROM documents
WHERE doc_id % 5 = 4
"""


ARW_ROUNDTRIP_SCHEMA = (
    "doc_id long, width int, height int, bits int, n_strips int, "
    "lossless_exact boolean, sample_sum bigint"
)


def _q_arw_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sony ARW (TIFF-EP, VERDICT r7 next#2) driven end-to-end on
    self-produced bytes: varies 12/14/16-bit packing AND rows_per_strip
    1..4, so the multi-strip independently-byte-aligned unpacking
    (TIFF 6.0 §3 — the ADVICE r7 desync fix) sits under the hash gate;
    odd widths at 12/14 bits make most strip payloads non-sample-
    aligned, exactly the case a continuous-bitstream unpack would
    corrupt. Registry-path assertion is skipped when an optional RAW
    library has claimed 'arw' (same policy as CR2)."""
    import numpy as np

    from . import binary, optional_codecs, rawvendor

    docs = _fanout(
        spark,
        catalog.load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 4 == 3
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                h, w = d % 17 + 5, d % 13 + 5
                bits = (12, 14, 16)[d % 3]
                rps = d % 4 + 1
                y, x = np.mgrid[0:h, 0:w]
                arr = ((d * 13 + x * 211 + y * 397) % (1 << bits)).astype(
                    np.uint16
                )
                arw = rawvendor.encode_arw_uncompressed(
                    arr, bits=bits, rows_per_strip=rps
                )
                dec = rawvendor.decode_arw(arw)
                ok = bool(np.array_equal(dec, arr))
                if "arw" not in optional_codecs.REGISTERED:
                    disp = binary.decode_any("arw", arw)
                    ok = ok and bool(
                        np.array_equal(
                            disp[:, :, 0], (arr >> 8).astype(np.uint8)
                        )
                    )
                out.append({
                    "doc_id": d,
                    "width": w,
                    "height": h,
                    "bits": bits,
                    "n_strips": (h + rps - 1) // rps,
                    "lossless_exact": ok,
                    "sample_sum": int(dec.astype(np.int64).sum()),
                })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "bits", "n_strips",
                         "lossless_exact", "sample_sum"],
            )

    return docs.mapInPandas(run, schema=ARW_ROUNDTRIP_SCHEMA)


ARW_ROUNDTRIP_DUCK = """
SELECT doc_id,
       CAST(doc_id % 13 + 5 AS INT) AS width,
       CAST(doc_id % 17 + 5 AS INT) AS height,
       CAST(CASE doc_id % 3 WHEN 0 THEN 12 WHEN 1 THEN 14 ELSE 16 END
            AS INT) AS bits,
       CAST((doc_id % 17 + 5 + doc_id % 4) // (doc_id % 4 + 1)
            AS INT) AS n_strips,
       TRUE AS lossless_exact,
       CAST((
         SELECT sum((doc_id * 13 + x.x * 211 + y.y * 397)
                    % (1 << CASE doc_id % 3 WHEN 0 THEN 12
                            WHEN 1 THEN 14 ELSE 16 END))
         FROM (SELECT unnest(generate_series(0, doc_id % 13 + 4)) AS x) x,
              (SELECT unnest(generate_series(0, doc_id % 17 + 4)) AS y) y
       ) AS BIGINT) AS sample_sum
FROM documents
WHERE doc_id % 4 = 3
"""


ARW2_ROUNDTRIP_SCHEMA = (
    "doc_id long, width int, height int, n_blocks int, "
    "lossless_exact boolean, sample_sum bigint"
)


def _q_arw_compressed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sony ARW2 block coding (Compression 32767) end-to-end: the
    encoder emits only exactly-representable blocks, the test pattern
    keeps every 16-pixel block's spread under 0x80 (sh=0, exact), so
    the decoder's 32-bit header unpack, even/odd column interleave,
    and delta arithmetic all sit under the hash gate."""
    import numpy as np

    from . import rawvendor

    docs = _fanout(
        spark,
        catalog.load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 5 == 1
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                h, w = d % 9 + 2, 32 * (d % 3 + 1)
                y, x = np.mgrid[0:h, 0:w]
                # per-row base + small per-column ripple: block spread
                # <= 100 < 0x80 keeps every block in the exact subset
                arr = (
                    (d * 19 + y * 37) % 1800 + (x * 7) % 101
                ).astype(np.uint16)
                arw = rawvendor.encode_arw_compressed(arr)
                dec = rawvendor.decode_arw(arw)
                out.append({
                    "doc_id": d,
                    "width": w,
                    "height": h,
                    "n_blocks": h * w // 16,
                    "lossless_exact": bool(np.array_equal(dec, arr)),
                    "sample_sum": int(dec.astype(np.int64).sum()),
                })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "n_blocks",
                         "lossless_exact", "sample_sum"],
            )

    return docs.mapInPandas(run, schema=ARW2_ROUNDTRIP_SCHEMA)


ARW2_ROUNDTRIP_DUCK = """
SELECT doc_id,
       CAST(32 * (doc_id % 3 + 1) AS INT) AS width,
       CAST(doc_id % 9 + 2 AS INT) AS height,
       CAST((doc_id % 9 + 2) * 32 * (doc_id % 3 + 1) // 16 AS INT)
           AS n_blocks,
       TRUE AS lossless_exact,
       CAST((
         SELECT sum((doc_id * 19 + y.y * 37) % 1800 + (x.x * 7) % 101)
         FROM (SELECT unnest(generate_series(0, 32 * (doc_id % 3 + 1) - 1))
               AS x) x,
              (SELECT unnest(generate_series(0, doc_id % 9 + 1)) AS y) y
       ) AS BIGINT) AS sample_sum
FROM documents
WHERE doc_id % 5 = 1
"""


def _tile_ck_spec():
    from ..operators import tiling

    return tiling.TileSpec(
        tile_size=TILE_CK, overlap_ratio=0.5, padding=0,
        pad_option="Extend Edges",
    )


_TILE_CK_IMAGES_CTE = """
images_meta AS (
  SELECT doc_id AS image_id,
         concat('img_', doc_id) AS basename,
         'png' AS ext,
         CAST(doc_id % 10 + 5 AS INT) AS width,
         CAST(doc_id % 9 + 5 AS INT) AS height
  FROM documents
)
"""


def _q_tile_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from ..operators import tiling
    from . import binary, png

    docs = catalog.load_table(spark, sf_dir, "documents")
    imgs = docs.select(
        F.col("doc_id").alias("image_id"),
        F.concat(F.lit("img_"), F.col("doc_id")).alias("basename"),
        F.lit("png").alias("ext"),
        (F.col("doc_id") % 10 + 5).cast("int").alias("width"),
        (F.col("doc_id") % 9 + 5).cast("int").alias("height"),
    )
    geom = tiling.tile_grid(imgs, _tile_ck_spec()).select(
        F.col("image_id").cast("string").alias("id"),
        "i", "j", "box_left", "box_top", "box_right", "box_bottom",
    )

    def gen_png(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 10 + 5, d % 9 + 5
                y, x, c = np.mgrid[0:h, 0:w, 0:3]
                arr = ((d + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)
                out.append(
                    {"id": str(d), "fmt": "png", "content": png.encode_png(arr)}
                )
            yield pd.DataFrame(out, columns=["id", "fmt", "content"])

    content = _fanout(spark, docs).mapInPandas(
        gen_png, schema="id string, fmt string, content binary"
    )
    pix = binary.materialize_tiles(
        geom.join(content, "id"), tile_size=TILE_CK, pad_option="Extend Edges"
    )

    def checksum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.error is not None:
                    raise RuntimeError(f"tile {row.id} ({row.i},{row.j}): {row.error}")
                t = binary.decode_any("rawrgb", bytes(row.content))
                out.append(
                    {
                        "doc_id": int(row.id),
                        "i": int(row.i),
                        "j": int(row.j),
                        "tile_w": int(t.shape[1]),
                        "tile_h": int(t.shape[0]),
                        "pix_sum": int(t.astype(np.int64).sum()),
                    }
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "i", "j", "tile_w", "tile_h", "pix_sum"]
            )

    return pix.mapInPandas(checksum, schema=TILE_CK_SCHEMA)


def _tile_checksum_duck() -> str:
    from ..operators import tiling

    geom_sql = tiling.tile_grid_sql(_tile_ck_spec(), _TILE_CK_IMAGES_CTE)
    return f"""
WITH geom AS ({geom_sql})
SELECT CAST(image_id AS BIGINT) AS doc_id, i, j,
       CAST({TILE_CK} AS INT) AS tile_w,
       CAST({TILE_CK} AS INT) AS tile_h,
       CAST(list_sum(list_transform(generate_series(0, {TILE_CK - 1}), ty ->
         list_sum(list_transform(generate_series(0, {TILE_CK - 1}), tx ->
           list_sum(list_transform([0,1,2], c ->
             (image_id + 3 * least(box_left + tx, box_right - 1)
                       + 7 * least(box_top + ty, box_bottom - 1)
                       + 11 * c) % 256)))))) AS BIGINT) AS pix_sum
FROM geom
"""


# --------------------------------------------------- video frame sampling
# Drives the REAL av.sample_frames operator (1 video row -> K frame
# rows, the video analogue of tile_grid) under the driver's hash gate:
# each sampled doc_id yields a deterministic rawvid clip (flat-index
# pixel lattice), every 3rd frame is sampled and re-encoded as a
# rawrgb payload by the operator, and a second kernel decodes each
# payload and checksums its pixels. The DuckDB oracle recomputes
# frame indices, timestamps, and pixel sums in closed form — a hash
# match proves the fan-out, the frame stride, the fps->timestamp
# math, and the rawvid->rawrgb byte plumbing end-to-end.

_FS_H, _FS_W, _FS_FPS, _FS_STRIDE = 6, 8, 10, 3

FRAME_SAMPLE_CK_SCHEMA = (
    "doc_id long, frame_idx int, ts_s double, "
    "frame_h int, frame_w int, pix_sum bigint"
)


def _q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import av, binary

    docs = _fanout(
        spark, catalog.load_table(spark, sf_dir, "documents")
    ).filter(F.col("doc_id") % 5 == 0)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 9 + 4
                f = np.arange(n, dtype=np.int64)[:, None]
                i = np.arange(_FS_H * _FS_W * 3, dtype=np.int64)[None, :]
                px = ((d * 13 + f * 17 + i * 3) % 256).astype(np.uint8)
                frames = px.reshape(n, _FS_H, _FS_W, 3)
                out.append(
                    {
                        "id": str(d),
                        "fmt": "rawvid",
                        "content": av.encode_rawvid(frames, fps=_FS_FPS),
                    }
                )
            yield pd.DataFrame(out, columns=["id", "fmt", "content"])

    vids = docs.mapInPandas(gen, schema="id string, fmt string, content binary")
    sampled = av.sample_frames(vids, every_n=_FS_STRIDE)

    def checksum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                arr = binary.decode_rawrgb(bytes(row.content))
                out.append(
                    {
                        "doc_id": int(row.id),
                        "frame_idx": int(row.frame_idx),
                        "ts_s": float(row.ts_s),
                        "frame_h": int(arr.shape[0]),
                        "frame_w": int(arr.shape[1]),
                        "pix_sum": int(arr.astype(np.int64).sum()),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "frame_idx", "ts_s",
                    "frame_h", "frame_w", "pix_sum",
                ],
            )

    return sampled.mapInPandas(checksum, schema=FRAME_SAMPLE_CK_SCHEMA)


FRAME_SAMPLE_DUCK = f"""
WITH vids AS (
  SELECT doc_id, doc_id % 9 + 4 AS n_frames
  FROM documents WHERE doc_id % 5 = 0
),
frames AS (
  SELECT doc_id,
         unnest(range(0, CAST(n_frames AS BIGINT), {_FS_STRIDE}))
           AS frame_idx
  FROM vids
)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(frame_idx AS DOUBLE) / {_FS_FPS} AS ts_s,
       CAST({_FS_H} AS INT) AS frame_h,
       CAST({_FS_W} AS INT) AS frame_w,
       CAST(list_sum(list_transform(
              generate_series(0, {_FS_H * _FS_W * 3 - 1}),
              i -> (doc_id * 13 + frame_idx * 17 + i * 3) % 256))
            AS BIGINT) AS pix_sum
FROM frames
"""


# ------------------------------------------------- audio feature extract
# Drives the REAL av.audio_features operator (decode + duration/RMS/
# peak summary) under the hash gate, on deterministic WAV fixtures
# (same sample lattice as mm_wav_roundtrip). RMS is hash-safe without
# rounding: the squares of int16 samples are exact in float64 and
# their sum stays far below 2^53, so sum, the /n division, and sqrt
# are all correctly-rounded IEEE — bit-identical in numpy and DuckDB.


def _q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import av

    docs = _fanout(
        spark, catalog.load_table(spark, sf_dir, "documents")
    ).filter(F.col("doc_id") % 3 == 0)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 500 + 100
                i = np.arange(n, dtype=np.int64)
                samples = ((d * 31 + i * 7) % 65536 - 32768).astype(np.int16)
                out.append(
                    {
                        "id": str(d),
                        "fmt": "wav",
                        "content": av.encode_wav(samples, sample_rate=16_000),
                    }
                )
            yield pd.DataFrame(out, columns=["id", "fmt", "content"])

    vids = docs.mapInPandas(gen, schema="id string, fmt string, content binary")
    return av.audio_features(vids)


AUDIO_FEATURES_DUCK = """
WITH base AS (
  SELECT doc_id, doc_id % 500 + 100 AS n
  FROM documents WHERE doc_id % 3 = 0
),
s AS (
  SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM base
),
v AS (
  SELECT doc_id, n, (doc_id * 31 + i * 7) % 65536 - 32768 AS x FROM s
)
SELECT CAST(doc_id AS VARCHAR) AS id,
       CAST(16000 AS INT) AS sample_rate,
       CAST(n AS INT) AS n_samples,
       CAST(n AS DOUBLE) / 16000 AS duration_s,
       sqrt(CAST(sum(x * x) AS DOUBLE) / n) AS rms,
       CAST(max(abs(x)) AS INT) AS peak,
       CAST(NULL AS VARCHAR) AS error
FROM v
GROUP BY doc_id, n
"""


# -------------------------------------------------- VAD segmentation
# Drives the REAL av.vad_segments operator (energy-threshold islands,
# the ASR-prep utterance splitter) on deterministic WAV fixtures; the
# DuckDB oracle recomputes frame energies in closed form and rebuilds
# the islands with a lag+cumsum window — a hash match proves framing,
# the exact-integer energy threshold, and the run-merge logic.

_VAD_THRESH = 22_900_000_000  # ~the all-x̄-uniform mean frame energy


def _q_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import av

    docs = _fanout(
        spark, catalog.load_table(spark, sf_dir, "documents")
    ).filter(F.col("doc_id") % 3 == 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 500 + 100
                i = np.arange(n, dtype=np.int64)
                samples = ((d * 31 + i * 7) % 65536 - 32768).astype(np.int16)
                out.append(
                    {
                        "id": str(d),
                        "fmt": "wav",
                        "content": av.encode_wav(samples, sample_rate=16_000),
                    }
                )
            yield pd.DataFrame(out, columns=["id", "fmt", "content"])

    wavs = docs.mapInPandas(gen, schema="id string, fmt string, content binary")
    return av.vad_segments(wavs, energy_thresh=_VAD_THRESH)


VAD_SEGMENTS_DUCK = f"""
WITH base AS (
  SELECT doc_id, doc_id % 500 + 100 AS n
  FROM documents WHERE doc_id % 3 = 1
),
fr AS (
  SELECT doc_id, unnest(generate_series(0, n // 64 - 1)) AS f
  FROM base WHERE n // 64 >= 1
),
en AS (
  SELECT doc_id, f,
         list_sum(list_transform(generate_series(0, 63),
            j -> ((doc_id * 31 + (f * 64 + j) * 7) % 65536 - 32768)
               * ((doc_id * 31 + (f * 64 + j) * 7) % 65536 - 32768)))
           AS energy
  FROM fr
),
act AS (SELECT doc_id, f, energy > {_VAD_THRESH} AS active FROM en),
seg0 AS (
  SELECT doc_id, f, active,
         CASE WHEN active AND NOT coalesce(
                lag(active) OVER (PARTITION BY doc_id ORDER BY f), FALSE)
              THEN 1 ELSE 0 END AS is_start
  FROM act
),
seg1 AS (
  SELECT doc_id, f, active,
         sum(is_start) OVER (PARTITION BY doc_id ORDER BY f
             ROWS UNBOUNDED PRECEDING) - 1 AS seg
  FROM seg0
)
SELECT CAST(doc_id AS VARCHAR) AS id,
       CAST(seg AS INT) AS seg_idx,
       CAST(min(f) AS INT) AS start_frame,
       CAST(max(f) AS INT) AS end_frame,
       CAST(count(*) AS INT) AS n_frames,
       CAST(min(f) * 64 AS DOUBLE) / 16000 AS start_s,
       CAST(NULL AS VARCHAR) AS error
FROM seg1 WHERE active
GROUP BY doc_id, seg
ORDER BY id, seg_idx
"""


# ------------------------------------------------ spectral front-end
# Drives av.spectral_features (fixed-point DFT filter bank) under the
# hash gate on the same deterministic WAV lattice as the other audio
# queries (slice doc_id%3==2, disjoint from features/VAD). The DuckDB
# oracle joins the LITERAL integer twiddle table exported by av.py —
# the exact integers the numpy GEMM used — and rebuilds re/im/power
# per frame, so a framing bug, a truncation-direction bug, or any
# float leak in the kernel cannot hash green.


def _q_audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import av

    docs = _fanout(
        spark, catalog.load_table(spark, sf_dir, "documents")
    ).filter(F.col("doc_id") % 3 == 2)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 500 + 100
                i = np.arange(n, dtype=np.int64)
                samples = ((d * 31 + i * 7) % 65536 - 32768).astype(np.int16)
                out.append(
                    {
                        "id": str(d),
                        "fmt": "wav",
                        "content": av.encode_wav(samples, sample_rate=16_000),
                    }
                )
            yield pd.DataFrame(out, columns=["id", "fmt", "content"])

    wavs = docs.mapInPandas(gen, schema="id string, fmt string, content binary")
    return av.spectral_features(wavs)


def _audio_spectral_duck() -> str:
    from . import av

    half = av.SPEC_BINS // 2
    lo = " + ".join(f"ps[{j}]" for j in range(1, half + 1))
    hi = " + ".join(f"ps[{j}]" for j in range(half + 1, av.SPEC_BINS + 1))
    return f"""
WITH tw(k, i, c, s) AS (VALUES {av.spec_twiddle_values_sql()}),
base AS (
  SELECT doc_id, doc_id % 500 + 100 AS n
  FROM documents WHERE doc_id % 3 = 2
),
fr AS (
  SELECT doc_id, unnest(generate_series(0, n // {av.SPEC_FRAME} - 1)) AS f
  FROM base WHERE n // {av.SPEC_FRAME} >= 1
),
sums AS (
  SELECT fr.doc_id, fr.f, tw.k,
         CAST(sum(((fr.doc_id * 31 + (fr.f * {av.SPEC_FRAME} + tw.i) * 7)
                   % 65536 - 32768) * tw.c) AS BIGINT) AS re,
         CAST(sum(((fr.doc_id * 31 + (fr.f * {av.SPEC_FRAME} + tw.i) * 7)
                   % 65536 - 32768) * tw.s) AS BIGINT) AS im
  FROM fr, tw
  GROUP BY fr.doc_id, fr.f, tw.k
),
powers AS (
  SELECT doc_id, f, k,
         (re // {av.SPEC_FRAME}) * (re // {av.SPEC_FRAME})
         + (im // {av.SPEC_FRAME}) * (im // {av.SPEC_FRAME}) AS p
  FROM sums
),
pl AS (
  SELECT doc_id, f, list(p ORDER BY k) AS ps
  FROM powers GROUP BY doc_id, f
)
SELECT CAST(doc_id AS VARCHAR) AS id,
       CAST(f AS INT) AS frame_idx,
       CAST(list_position(ps, list_max(ps)) AS INT) AS dom_bin,
       CAST({lo} AS BIGINT) AS p_low,
       CAST({hi} AS BIGINT) AS p_high,
       CAST(NULL AS VARCHAR) AS error
FROM pl
"""


# ------------------------------------------------ audio peak normalize
# Drives av.normalize_peak under the hash gate on the shared WAV
# lattice (slice doc_id%3==1, same fixture family as VAD; the oracle
# recomputes peak, the sign-aware truncating rescale, and the
# normalized sample sum closed-form, so a floor-vs-trunc division
# slip on negative samples cannot hash green).


def _q_audio_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import av

    docs = _fanout(
        spark, catalog.load_table(spark, sf_dir, "documents")
    ).filter(F.col("doc_id") % 3 == 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 500 + 100
                i = np.arange(n, dtype=np.int64)
                samples = ((d * 31 + i * 7) % 65536 - 32768).astype(np.int16)
                out.append(
                    {
                        "id": str(d),
                        "fmt": "wav",
                        "content": av.encode_wav(samples, sample_rate=16_000),
                    }
                )
            yield pd.DataFrame(out, columns=["id", "fmt", "content"])

    wavs = docs.mapInPandas(gen, schema="id string, fmt string, content binary")
    return av.normalize_peak(wavs)


# ------------------------------------------ rational audio resampling
# Drives av.resample_linear (p/q = 3/2: the 16k -> 24k unification
# pass) over the same deterministic waveform family as the normalize
# query on a disjoint doc subset. Exact integer interpolation means
# the oracle recomputes every output sample in closed form; the
# position-weighted sum pins output ORDER, not just the multiset.


def _q_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import av

    docs = _fanout(
        spark, catalog.load_table(spark, sf_dir, "documents")
    ).filter(F.col("doc_id") % 3 == 2)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 500 + 100
                i = np.arange(n, dtype=np.int64)
                samples = ((d * 31 + i * 7) % 65536 - 32768).astype(np.int16)
                out.append(
                    {
                        "id": str(d),
                        "fmt": "wav",
                        "content": av.encode_wav(samples, sample_rate=16_000),
                    }
                )
            yield pd.DataFrame(out, columns=["id", "fmt", "content"])

    wavs = docs.mapInPandas(gen, schema="id string, fmt string, content binary")
    return av.resample_linear(wavs, p=3, q=2)


AUDIO_RESAMPLE_DUCK = """
WITH base AS (
  SELECT doc_id, doc_id % 500 + 100 AS n
  FROM documents WHERE doc_id % 3 = 2
),
o AS (
  SELECT doc_id, n, ((n - 1) * 3) // 2 + 1 AS n_out FROM base
),
s AS (
  SELECT doc_id, n, n_out, unnest(generate_series(0, n_out - 1)) AS i
  FROM o
),
c AS (
  SELECT doc_id, n, n_out, i, (i * 2) // 3 AS k, (i * 2) % 3 AS r FROM s
),
v AS (
  SELECT doc_id, n, n_out, i, r,
         (doc_id * 31 + k * 7) % 65536 - 32768 AS xk,
         (doc_id * 31 + least(k + 1, n - 1) * 7) % 65536 - 32768 AS xk1
  FROM c
),
y AS (
  SELECT doc_id, n, n_out, i,
         xk + ((xk1 - xk) * r) // 3 AS y
  FROM v
)
SELECT CAST(doc_id AS VARCHAR) AS id,
       CAST(n AS INT) AS n_in,
       CAST(n_out AS INT) AS n_out,
       CAST(24000 AS INT) AS rate_out,
       CAST(sum(y) AS BIGINT) AS out_sum,
       CAST(sum(y * (i + 1)) AS BIGINT) AS out_wsum,
       CAST(NULL AS VARCHAR) AS error
FROM y
GROUP BY doc_id, n, n_out
"""


AUDIO_NORMALIZE_DUCK = """
WITH base AS (
  SELECT doc_id, doc_id % 500 + 100 AS n
  FROM documents WHERE doc_id % 3 = 1
),
s AS (
  SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM base
),
v AS (
  SELECT doc_id, n, (doc_id * 31 + i * 7) % 65536 - 32768 AS x FROM s
),
p AS (
  SELECT doc_id, CAST(max(abs(x)) AS BIGINT) AS peak
  FROM v GROUP BY doc_id
),
y AS (
  SELECT v.doc_id, v.n, p.peak, (v.x * 32767) // p.peak AS y
  FROM v JOIN p ON v.doc_id = p.doc_id
)
SELECT CAST(doc_id AS VARCHAR) AS id,
       CAST(n AS INT) AS n_samples,
       CAST(peak AS INT) AS peak_before,
       CAST(max(abs(y)) AS INT) AS peak_after,
       CAST(sum(y) AS BIGINT) AS sample_sum,
       CAST(NULL AS VARCHAR) AS error
FROM y
GROUP BY doc_id, n, peak
"""


# --------------------------------------------- scrub_images routing
# Gates the DataFrame-level metascrub.scrub_images operator (the
# byte-level functions are gated by mm_exif_scrub): three format
# routes in one fixture — JPEG (segment scrub; injected Exif of
# known size), TIFF (transcode scrub; trailing slack of known size
# that the re-encode drops — real files carry trailing thumbnails/
# editor junk exactly like this), and an unsupported format that
# must take the F7 quarantine path. Every audit column is closed-form
# in doc_id, so a routing mix-up cannot hash green.


def _q_scrub_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import jpeg, metascrub, tiff as tiff_mod

    docs = _fanout(spark, catalog.load_table(spark, sf_dir, "documents"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 24 + 8, d % 17 + 8
                y, x = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [x * 3 + d % 100, y * 4 + d % 80, x + y + d % 50],
                    axis=2,
                ).astype(np.uint8)
                route = d % 3
                if route == 0:
                    content = metascrub.inject_app1(
                        jpeg.encode_jpeg(arr, quality=85),
                        metascrub.build_exif_app1(d % 17),
                    )
                    fmt = "jpg"
                elif route == 1:
                    content = tiff_mod.encode_tiff(arr) + b"\x00" * (d % 23)
                    fmt = "tiff"
                else:
                    content = b"GIF89a..."
                    fmt = "gif"
                out.append({"id": str(d), "fmt": fmt, "content": content})
            yield pd.DataFrame(out, columns=["id", "fmt", "content"])

    files = docs.mapInPandas(
        gen, schema="id string, fmt string, content binary"
    )
    scrubbed = metascrub.scrub_images(files)
    return scrubbed.select(
        F.col("id").cast("bigint").alias("doc_id"),
        "bytes_removed",
        "had_gps",
        F.col("error").isNotNull().alias("has_error"),
    )


from .metascrub import APP1_OVERHEAD as _APP1_OVERHEAD

SCRUB_ROUTING_DUCK = f"""
SELECT doc_id,
       CASE doc_id % 3
         WHEN 0 THEN CAST({_APP1_OVERHEAD} + doc_id % 17 AS INT)
         WHEN 1 THEN CAST(doc_id % 23 AS INT)
         ELSE CAST(NULL AS INT)
       END AS bytes_removed,
       CASE doc_id % 3
         WHEN 0 THEN TRUE WHEN 1 THEN FALSE ELSE CAST(NULL AS BOOLEAN)
       END AS had_gps,
       doc_id % 3 = 2 AS has_error
FROM documents
"""


# --------------------------------------------- video scene-cut detect
# Drives av.scene_changes (adjacent-frame difference energy, the
# keyframe-selection primitive) under the hash gate. The fixture
# plants exactly one cut per clip: pixels follow the frame-sample
# lattice plus a +128 level jump from the midpoint frame onward, so
# the cut boundary's difference energy (~16k/pixel across the mod-256
# wrap) separates cleanly from the inter-frame pan (~4k/pixel at
# shift 17). The oracle recomputes every pixel difference closed-form
# — threshold, wrap arithmetic, and framing are all pinned.

_SC_THRESH = _FS_H * _FS_W * 3 * 8000  # between pan and cut energy


def _q_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import av

    docs = _fanout(
        spark, catalog.load_table(spark, sf_dir, "documents")
    ).filter(F.col("doc_id") % 5 == 0)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 9 + 4
                cut = n // 2
                f = np.arange(n, dtype=np.int64)[:, None]
                i = np.arange(_FS_H * _FS_W * 3, dtype=np.int64)[None, :]
                px = (
                    (d * 13 + f * 17 + i * 3 + (f >= cut) * 128) % 256
                ).astype(np.uint8)
                out.append(
                    {
                        "id": str(d),
                        "content": av.encode_rawvid(
                            px.reshape(n, _FS_H, _FS_W, 3), fps=_FS_FPS
                        ),
                    }
                )
            yield pd.DataFrame(out, columns=["id", "content"])

    vids = docs.mapInPandas(gen, schema="id string, content binary")
    return av.scene_changes(vids, energy_thresh=_SC_THRESH)


_SC_PIX = (
    "(doc_id * 13 + ({f}) * 17 + i * 3"
    " + CASE WHEN ({f}) >= cut THEN 128 ELSE 0 END) % 256"
)

VIDEO_SCENE_CUTS_DUCK = f"""
WITH vids AS (
  SELECT doc_id, doc_id % 9 + 4 AS n, (doc_id % 9 + 4) // 2 AS cut
  FROM documents WHERE doc_id % 5 = 0
),
bounds AS (
  SELECT doc_id, cut, unnest(generate_series(0, n - 2)) AS f FROM vids
),
scored AS (
  SELECT doc_id, f,
         CAST(list_sum(list_transform(
           list_transform(generate_series(0, {_FS_H * _FS_W * 3 - 1}),
             i -> ({_SC_PIX.format(f="f + 1")})
                - ({_SC_PIX.format(f="f")})),
           d -> d * d)) AS BIGINT) AS delta_energy
  FROM bounds
)
SELECT CAST(doc_id AS VARCHAR) AS id,
       CAST(f AS INT) AS frame_idx,
       delta_energy,
       delta_energy > {_SC_THRESH} AS is_cut,
       CAST(NULL AS VARCHAR) AS error
FROM scored
"""


# ------------------------------------------------ EXIF/GPS PII scrub
# Drives metascrub.scrub_jpeg under the hash gate: each fixture JPEG
# (the repo's own encoder, the mm_jpeg_roundtrip ramp) gets a
# deterministic Exif APP1 with a GPS IFD and doc_id-sized maker-note
# padding injected, then scrubbed. Gated facts: GPS audited present
# before and absent after, exactly the injected segment removed
# (APP1_OVERHEAD + doc_id%17 bytes), the scrubbed file byte-equal to
# the pre-injection original, and the decoded pixels bit-equal — a
# scrub that recompresses, over-drops, or desyncs the marker walk
# cannot hash green.

EXIF_SCRUB_SCHEMA = (
    "doc_id long, had_gps boolean, n_dropped int, bytes_removed int, "
    "clean_after boolean, bytes_restored boolean, pix_equal boolean"
)


def _q_exif_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import binary, jpeg, metascrub

    docs = _fanout(spark, catalog.load_table(spark, sf_dir, "documents"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 24 + 8, d % 17 + 8
                y, x = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [x * 3 + d % 100, y * 4 + d % 80, x + y + d % 50],
                    axis=2,
                ).astype(np.uint8)
                orig = jpeg.encode_jpeg(arr, quality=85)
                pad = d % 17
                dirty = metascrub.inject_app1(
                    orig, metascrub.build_exif_app1(pad)
                )
                before = metascrub.jpeg_metadata_flags(dirty)
                clean, dropped, removed = metascrub.scrub_jpeg(dirty)
                after = metascrub.jpeg_metadata_flags(clean)
                out.append(
                    {
                        "doc_id": d,
                        "had_gps": bool(before["has_gps"]),
                        "n_dropped": int(dropped),
                        "bytes_removed": int(removed),
                        "clean_after": bool(
                            not after["has_exif"]
                            and after["n_meta_segments"] == 0
                        ),
                        "bytes_restored": bool(clean == orig),
                        "pix_equal": bool(
                            np.array_equal(
                                binary.decode_any("jpg", dirty),
                                binary.decode_any("jpg", clean),
                            )
                        ),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "had_gps", "n_dropped", "bytes_removed",
                         "clean_after", "bytes_restored", "pix_equal"],
            )

    return docs.mapInPandas(run, schema=EXIF_SCRUB_SCHEMA)


def _exif_scrub_duck() -> str:
    from . import metascrub

    return f"""
SELECT doc_id,
       TRUE AS had_gps,
       CAST(1 AS INT) AS n_dropped,
       CAST({metascrub.APP1_OVERHEAD} + doc_id % 17 AS INT)
         AS bytes_removed,
       TRUE AS clean_after,
       TRUE AS bytes_restored,
       TRUE AS pix_equal
FROM documents
"""


# -------------------------------------------- audio fingerprint dedup
# Composes the spectral front-end into the dedup family: recordings
# are fingerprinted by their dominant-bin sequence (av.audio_
# fingerprints) and grouped — perceptual exact-dup detection for
# audio. The fixture PLANTS duplicates: doc_ids 6m+2 and 6m+5 render
# the same seed waveform (seed = doc_id floored to its 6-block), and
# the sawtooth STEP varies with the seed (8 frequency classes x 8
# length classes) so distinct seeds usually fingerprint apart. Same-
# class seeds legitimately collide (same pitch, same length — the
# perceptual-match semantics); the oracle pins the exact group
# structure either way, and the planted-pair containment is pinned
# separately in tests/test_av.py.

_FP_SEED = "doc_id - CASE WHEN doc_id % 6 = 5 THEN 3 ELSE 0 END"


def _q_audio_fingerprint_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import av

    docs = _fanout(
        spark, catalog.load_table(spark, sf_dir, "documents")
    ).filter(F.col("doc_id") % 3 == 2).select(
        "doc_id", F.expr(_FP_SEED).alias("seed")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, seed in zip(pdf["doc_id"], pdf["seed"]):
                s = int(seed)
                n = s % 500 + 100
                step = (s % 8 + 1) * 1024
                i = np.arange(n, dtype=np.int64)
                samples = ((s * 31 + i * step) % 65536 - 32768).astype(
                    np.int16
                )
                out.append(
                    {
                        "id": str(int(doc_id)),
                        "fmt": "wav",
                        "content": av.encode_wav(samples, sample_rate=16_000),
                    }
                )
            yield pd.DataFrame(out, columns=["id", "fmt", "content"])

    wavs = docs.mapInPandas(gen, schema="id string, fmt string, content binary")
    fps = av.audio_fingerprints(wavs)
    return fps.groupBy("fingerprint").agg(
        F.count(F.lit(1)).cast("int").alias("n_copies"),
        F.min("n_frames").alias("n_frames"),
        F.min(F.col("id").cast("bigint")).alias("canonical_id"),
    )


def _audio_fingerprint_duck() -> str:
    from . import av

    return f"""
WITH tw(k, i, c, s) AS (VALUES {av.spec_twiddle_values_sql()}),
base AS (
  SELECT doc_id, {_FP_SEED} AS sd,
         ({_FP_SEED}) % 500 + 100 AS n
  FROM documents WHERE doc_id % 3 = 2
),
fr AS (
  SELECT doc_id, sd,
         unnest(generate_series(0, n // {av.SPEC_FRAME} - 1)) AS f
  FROM base WHERE n // {av.SPEC_FRAME} >= 1
),
sums AS (
  SELECT fr.doc_id, fr.f, tw.k,
         CAST(sum(((fr.sd * 31
                    + (fr.f * {av.SPEC_FRAME} + tw.i)
                      * ((fr.sd % 8 + 1) * 1024))
                   % 65536 - 32768) * tw.c) AS BIGINT) AS re,
         CAST(sum(((fr.sd * 31
                    + (fr.f * {av.SPEC_FRAME} + tw.i)
                      * ((fr.sd % 8 + 1) * 1024))
                   % 65536 - 32768) * tw.s) AS BIGINT) AS im
  FROM fr, tw
  GROUP BY fr.doc_id, fr.f, tw.k
),
powers AS (
  SELECT doc_id, f, k,
         (re // {av.SPEC_FRAME}) * (re // {av.SPEC_FRAME})
         + (im // {av.SPEC_FRAME}) * (im // {av.SPEC_FRAME}) AS p
  FROM sums
),
dom AS (
  SELECT doc_id, f,
         list_position(list(p ORDER BY k),
                       list_max(list(p ORDER BY k))) AS dom_bin
  FROM powers GROUP BY doc_id, f
),
fp AS (
  SELECT doc_id,
         CAST(count(*) AS INT) AS n_frames,
         md5(string_agg(CAST(dom_bin AS VARCHAR), ',' ORDER BY f))
           AS fingerprint
  FROM dom GROUP BY doc_id
)
SELECT fingerprint,
       CAST(count(*) AS INT) AS n_copies,
       CAST(min(n_frames) AS INT) AS n_frames,
       CAST(min(doc_id) AS BIGINT) AS canonical_id
FROM fp
GROUP BY fingerprint
"""


BMP_DEPTHS_SCHEMA = (
    "doc_id long, bpp int, compression int, core boolean, "
    "top_down boolean, lossless_exact boolean, pix_sum bigint"
)


def _q_bmp_depths_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-depth BMP coverage (round 8): every uncompressed branch
    the decoder supports — 1/4/8-bit palette, 24-bit BGR, 32-bit BGRA
    (alpha dropped), BI_RLE8 and BI_RLE4 compressed streams — across
    BOTH header generations (12-byte core / 40-byte info) and both
    row orders, each encoded with encode_bmp_ex / encode_bmp_rle,
    decoded through the REGISTRY path, and compared against the
    closed-form expected display. A nibble-order swap, palette-entry-
    width mix-up (3- vs 4-byte), BGR/RGB confusion, row-flip, or RLE
    run/escape bug cannot hash green."""
    import numpy as np

    from . import binary

    docs = _fanout(
        spark,
        catalog.load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 7 == 0
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs_extra

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                h, w = d % 8 + 2, d % 10 + 2
                branch = (d // 7) % 7
                y, x = np.mgrid[0:h, 0:w]
                c = np.arange(3)
                compression = (0, 0, 0, 0, 0, 1, 2)[branch]
                if branch <= 2 or branch >= 5:   # palette depths
                    bpp = (8, 4, 1, 0, 0, 8, 4)[branch]
                    core = branch == 1
                    top_down = branch == 2
                    n = 1 << bpp
                    idx = ((d * 13 + x * 29 + y * 53) % n).astype(np.uint8)
                    pal = (
                        (d * 7 + np.arange(n)[:, None] * 31 + c * 59) % 256
                    ).astype(np.uint8)
                    if compression:
                        data = codecs_extra.encode_bmp_rle(
                            idx, pal, bpp=bpp
                        )
                    else:
                        data = codecs_extra.encode_bmp_ex(
                            idx, bpp=bpp, palette=pal, core=core,
                            top_down=top_down,
                        )
                    expect = pal[idx]
                else:
                    rgb = (
                        (d * 13 + x[:, :, None] * 29 + y[:, :, None] * 53
                         + c * 77) % 256
                    ).astype(np.uint8)
                    core = branch == 3
                    top_down = branch == 4
                    if branch == 3:      # 24-bit, core header
                        bpp = 24
                        data = codecs_extra.encode_bmp_ex(
                            rgb, bpp=24, core=True
                        )
                    else:                # 32-bit BGRA, top-down
                        bpp = 32
                        alpha = ((d + x + y) % 256).astype(np.uint8)
                        rgba = np.dstack([rgb, alpha])
                        data = codecs_extra.encode_bmp_ex(
                            rgba, bpp=32, top_down=True
                        )
                    expect = rgb
                dec = binary.decode_any("bmp", data)
                out.append({
                    "doc_id": d,
                    "bpp": bpp,
                    "compression": compression,
                    "core": core,
                    "top_down": top_down,
                    "lossless_exact": bool(np.array_equal(dec, expect)),
                    "pix_sum": int(dec.astype(np.int64).sum()),
                })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "bpp", "compression", "core",
                         "top_down", "lossless_exact", "pix_sum"],
            )

    return docs.mapInPandas(run, schema=BMP_DEPTHS_SCHEMA)


BMP_DEPTHS_DUCK = """
WITH b AS (
  SELECT doc_id, (doc_id // 7) % 7 AS br
  FROM documents WHERE doc_id % 7 = 0
)
SELECT doc_id,
       CAST(CASE br WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 1
            WHEN 3 THEN 24 WHEN 4 THEN 32 WHEN 5 THEN 8 ELSE 4 END
            AS INT) AS bpp,
       CAST(CASE br WHEN 5 THEN 1 WHEN 6 THEN 2 ELSE 0 END
            AS INT) AS compression,
       br IN (1, 3) AS core,
       br IN (2, 4) AS top_down,
       TRUE AS lossless_exact,
       CAST((
         SELECT sum(CASE
           WHEN br <= 2 OR br >= 5 THEN
             (doc_id * 7
              + ((doc_id * 13 + x.x * 29 + y.y * 53)
                 % (CASE br WHEN 1 THEN 16 WHEN 2 THEN 2
                    WHEN 6 THEN 16 ELSE 256 END)) * 31
              + c.c * 59) % 256
           ELSE
             (doc_id * 13 + x.x * 29 + y.y * 53 + c.c * 77) % 256
         END)
         FROM (SELECT unnest(generate_series(0, doc_id % 10 + 1)) AS x) x,
              (SELECT unnest(generate_series(0, doc_id % 8 + 1)) AS y) y,
              (SELECT unnest(generate_series(0, 2)) AS c) c
       ) AS BIGINT) AS pix_sum
FROM b
"""


CONVERT_CHAIN_SCHEMA = (
    "doc_id long, chain string, lossless_exact boolean, pix_sum bigint"
)

_CONVERT_CHAINS = (
    ("png", "bmp", "ppm", "tiff"),
    ("tiff", "png", "webp", "bmp"),
    ("webp", "ppm", "tiff", "png"),
)


def _q_format_convert_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's headline conversion task
    (/root/reference/modules/other_tasks.py:29-67 — decode any, save
    as another format) driven as a CHAIN across every lossless codec
    in the registry: encode -> decode -> re-encode in the next format,
    four hops per document, three chain orders so each adjacent
    format pair appears. All hops are lossless codecs, so the final
    pixels must equal the closed-form source exactly — any
    channel-order, row-order, or depth drift at ANY registry boundary
    breaks the hash."""
    import numpy as np

    from . import binary

    docs = _fanout(
        spark,
        catalog.load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 9 == 5
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                h, w = d % 9 + 3, d % 12 + 3
                chain = _CONVERT_CHAINS[d % 3]
                y, x = np.mgrid[0:h, 0:w]
                c = np.arange(3)
                arr0 = (
                    (d * 11 + x[:, :, None] * 37 + y[:, :, None] * 71
                     + c * 13) % 256
                ).astype(np.uint8)
                arr = arr0
                for fmt in chain:
                    arr = binary.decode_any(fmt, binary.ENCODERS[fmt](arr))
                out.append({
                    "doc_id": d,
                    "chain": ">".join(chain),
                    "lossless_exact": bool(np.array_equal(arr, arr0)),
                    "pix_sum": int(arr.astype(np.int64).sum()),
                })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "chain", "lossless_exact", "pix_sum"],
            )

    return docs.mapInPandas(run, schema=CONVERT_CHAIN_SCHEMA)


CONVERT_CHAIN_DUCK = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'png>bmp>ppm>tiff'
            WHEN 1 THEN 'tiff>png>webp>bmp'
            ELSE 'webp>ppm>tiff>png' END AS chain,
       TRUE AS lossless_exact,
       CAST((
         SELECT sum((doc_id * 11 + x.x * 37 + y.y * 71 + c.c * 13) % 256)
         FROM (SELECT unnest(generate_series(0, doc_id % 12 + 2)) AS x) x,
              (SELECT unnest(generate_series(0, doc_id % 9 + 2)) AS y) y,
              (SELECT unnest(generate_series(0, 2)) AS c) c
       ) AS BIGINT) AS pix_sum
FROM documents
WHERE doc_id % 9 = 5
"""


JPEG12_SCHEMA = (
    "doc_id long, width int, height int, quality int, within_tol boolean"
)


def _q_jpeg12_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-bit extended-sequential JPEG (SOF1, round 8 late): encode a
    smooth 12-bit gray ramp with the stream-derived flat Huffman
    tables, decode through the REGISTRY path (level shift 2048, clamp
    0..4095, top-byte display), compare against the closed-form ramp
    at display precision. Wrong level shift, clamp bound, DC category
    width, or tone-map shift cannot stay within the +-1 bound."""
    import numpy as np

    from . import binary, jpeg as jpegmod

    docs = _fanout(
        spark,
        catalog.load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 11 == 4
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                h, w = d % 14 + 4, d % 21 + 4
                quality = (90, 95, 100)[d % 3]
                y, x = np.mgrid[0:h, 0:w]
                arr = (x * 60 + y * 70 + d % 1000).astype(np.uint16)
                data = jpegmod.encode_jpeg12_gray(arr, quality=quality)
                dec = binary.decode_any("jpg", data)
                exp = (arr >> 4).astype(np.uint8)
                err = int(
                    np.abs(dec[:, :, 0].astype(int) - exp.astype(int)).max()
                )
                gray_ok = bool(
                    np.array_equal(dec[:, :, 0], dec[:, :, 1])
                    and np.array_equal(dec[:, :, 0], dec[:, :, 2])
                )
                out.append({
                    "doc_id": d,
                    "width": w,
                    "height": h,
                    "quality": quality,
                    "within_tol": bool(err <= 1 and gray_ok),
                })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "quality",
                         "within_tol"],
            )

    return docs.mapInPandas(run, schema=JPEG12_SCHEMA)


JPEG12_DUCK = """
SELECT doc_id,
       CAST(doc_id % 21 + 4 AS INT) AS width,
       CAST(doc_id % 14 + 4 AS INT) AS height,
       CAST(CASE doc_id % 3 WHEN 0 THEN 90 WHEN 1 THEN 95 ELSE 100 END
            AS INT) AS quality,
       TRUE AS within_tol
FROM documents
WHERE doc_id % 11 = 4
"""


WAV_DEPTHS_SCHEMA = (
    "doc_id long, codec string, n_samples int, rate int, "
    "decode_exact boolean, sample_sum bigint"
)

_WAV_BRANCHES = ("pcm8", "pcm16", "pcm24", "pcm32", "mulaw", "alaw")


def _q_wav_depths_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV format matrix (round 8 late): 8/16/24/32-bit PCM and
    G.711 mu-law/A-law streams, each hand-built as raw RIFF from a
    doc_id formula, decoded through av.decode_wav, and summed. The
    DuckDB oracle recomputes every branch's int16 normalization in
    closed form — including the full G.711 expansion arithmetic — so
    a bias, shift, sign, or segment-table bug in any branch cannot
    hash green."""
    import struct as _struct

    import numpy as np

    from . import av as avmod

    docs = _fanout(
        spark,
        catalog.load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 9 == 1
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def riff(code, bits, payload, rate):
            fmt = _struct.pack(
                "<HHIIHH", code, 1, rate, rate * bits // 8, bits // 8, bits
            )
            out = (b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                   + b"data" + _struct.pack("<I", len(payload)) + payload)
            if len(payload) % 2:
                out += b"\x00"
            return b"RIFF" + _struct.pack("<I", len(out)) + out

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 50 + 10
                rate = (8000, 16000, 44100)[d % 3]
                branch = (d // 9) % 6
                i = np.arange(n, dtype=np.int64)
                if branch == 0:
                    v = (d * 7 + i * 13) % 256
                    payload = v.astype(np.uint8).tobytes()
                    code, bits = 1, 8
                    expect = ((v - 128) << 8).astype(np.int16)
                elif branch == 1:
                    u = (d * 11 + i * 17) % 65536
                    expect = np.where(u >= 32768, u - 65536, u).astype(
                        np.int16
                    )
                    payload = expect.astype("<i2").tobytes()
                    code, bits = 1, 16
                elif branch == 2:
                    u = (d * 13 + i * 101) % (1 << 24)
                    payload = b"".join(
                        int(x).to_bytes(3, "little") for x in u
                    )
                    code, bits = 1, 24
                    expect = (
                        ((u + (1 << 23)) % (1 << 24)) // 256 - 32768
                    ).astype(np.int16)
                elif branch == 3:
                    u = (d * 19 + i * 333) % (1 << 32)
                    payload = u.astype("<u4").tobytes()
                    code, bits = 1, 32
                    expect = (
                        ((u + (1 << 31)) % (1 << 32)) // 65536 - 32768
                    ).astype(np.int16)
                elif branch == 4:
                    c = ((d * 5 + i * 29) % 256).astype(np.uint8)
                    payload = c.tobytes()
                    code, bits = 7, 8
                    expect = avmod.mulaw_expand(c)
                else:
                    c = ((d * 5 + i * 29) % 256).astype(np.uint8)
                    payload = c.tobytes()
                    code, bits = 6, 8
                    expect = avmod.alaw_expand(c)
                dec, got_rate = avmod.decode_wav(riff(code, bits, payload,
                                                      rate))
                out.append({
                    "doc_id": d,
                    "codec": _WAV_BRANCHES[branch],
                    "n_samples": n,
                    "rate": int(got_rate),
                    "decode_exact": bool(np.array_equal(dec, expect)),
                    "sample_sum": int(dec.astype(np.int64).sum()),
                })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "codec", "n_samples", "rate",
                         "decode_exact", "sample_sum"],
            )

    return docs.mapInPandas(run, schema=WAV_DEPTHS_SCHEMA)


# closed-form int16 normalization per branch; G.711 expansion spelled
# out in integer arithmetic (u = 255-c for mu-law: negative when the
# complemented sign bit is set; a = xor(c,85) for A-law: POSITIVE when
# the post-XOR sign bit is set, per g711.c — segment exponent/mantissa
# from div/mod)
WAV_DEPTHS_DUCK = """
WITH b AS (
  SELECT doc_id, (doc_id // 9) % 6 AS br, doc_id % 50 + 10 AS n
  FROM documents WHERE doc_id % 9 = 1
)
SELECT doc_id,
       CASE br WHEN 0 THEN 'pcm8' WHEN 1 THEN 'pcm16' WHEN 2 THEN 'pcm24'
            WHEN 3 THEN 'pcm32' WHEN 4 THEN 'mulaw' ELSE 'alaw' END
           AS codec,
       CAST(n AS INT) AS n_samples,
       CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
            ELSE 44100 END AS INT) AS rate,
       TRUE AS decode_exact,
       CAST((
         SELECT sum(CASE br
           WHEN 0 THEN ((doc_id * 7 + i.i * 13) % 256 - 128) * 256
           WHEN 1 THEN CASE WHEN (doc_id * 11 + i.i * 17) % 65536 >= 32768
                       THEN (doc_id * 11 + i.i * 17) % 65536 - 65536
                       ELSE (doc_id * 11 + i.i * 17) % 65536 END
           WHEN 2 THEN (((doc_id * 13 + i.i * 101) % 16777216 + 8388608)
                        % 16777216) // 256 - 32768
           WHEN 3 THEN (((doc_id * 19 + i.i * 333) % 4294967296
                         + 2147483648) % 4294967296) // 65536 - 32768
           WHEN 4 THEN CASE WHEN 255 - (doc_id * 5 + i.i * 29) % 256 >= 128
             THEN -((((255 - (doc_id * 5 + i.i * 29) % 256) % 16) * 8 + 132)
                    * (1 << (((255 - (doc_id * 5 + i.i * 29) % 256) // 16)
                             % 8)) - 132)
             ELSE ((((255 - (doc_id * 5 + i.i * 29) % 256) % 16) * 8 + 132)
                   * (1 << (((255 - (doc_id * 5 + i.i * 29) % 256) // 16)
                            % 8)) - 132) END
           ELSE CASE WHEN xor((doc_id * 5 + i.i * 29) % 256, 85) >= 128
             THEN CASE WHEN (xor((doc_id * 5 + i.i * 29) % 256, 85)
                             // 16) % 8 = 0
                  THEN (xor((doc_id * 5 + i.i * 29) % 256, 85) % 16)
                       * 16 + 8
                  ELSE ((xor((doc_id * 5 + i.i * 29) % 256, 85) % 16 + 16)
                        * 16 + 8)
                       * (1 << ((xor((doc_id * 5 + i.i * 29) % 256, 85)
                                 // 16) % 8 - 1)) END
             ELSE -(CASE WHEN (xor((doc_id * 5 + i.i * 29) % 256, 85)
                              // 16) % 8 = 0
                    THEN (xor((doc_id * 5 + i.i * 29) % 256, 85) % 16)
                         * 16 + 8
                    ELSE ((xor((doc_id * 5 + i.i * 29) % 256, 85) % 16 + 16)
                          * 16 + 8)
                         * (1 << ((xor((doc_id * 5 + i.i * 29) % 256, 85)
                                   // 16) % 8 - 1)) END) END
         END)
         FROM (SELECT unnest(generate_series(0, n - 1)) AS i) i
       ) AS BIGINT) AS sample_sum
FROM b
"""


AVI_SCHEMA = (
    "doc_id long, n_frames int, fps int, implied_dht boolean, "
    "within_tol boolean, dht_forms_equal boolean"
)


def _q_avi_mjpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MJPEG-in-AVI (round 8 late): smooth ramp frames encoded into a
    real AVI container (hdrl/strl/movi/idx1), decoded through the
    VIDEO registry, frame pixels within the JPEG tolerance; odd docs
    emit the OpenDML implied-DHT form (frames without Huffman tables)
    and additionally assert it decodes bit-identically to the
    explicit-table form — the splice path under the gate."""
    import numpy as np

    from . import av as avmod

    docs = _fanout(
        spark,
        catalog.load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 13 == 6
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 5 + 2
                h, w = d % 10 + 8, d % 15 + 8
                fps = (10, 24, 30)[d % 3]
                implied = bool(d % 2)
                y, x = np.mgrid[0:h, 0:w]
                frames = np.stack([
                    np.stack(
                        [x * 3 + k * 10 + d % 50, y * 4 + k * 5,
                         x + y + k * 7],
                        axis=2,
                    ).astype(np.uint8)
                    for k in range(n)
                ])
                data = avmod.encode_avi_mjpeg(
                    frames, fps=fps, strip_dht=implied
                )
                dec, got_fps = avmod.VIDEO_CODECS["avi"](data)
                err = int(np.abs(dec.astype(int) - frames.astype(int)).max())
                alt, _ = avmod.decode_avi_mjpeg(
                    avmod.encode_avi_mjpeg(
                        frames, fps=fps, strip_dht=not implied
                    )
                )
                out.append({
                    "doc_id": d,
                    "n_frames": int(dec.shape[0]),
                    "fps": int(got_fps),
                    "implied_dht": implied,
                    "within_tol": bool(err <= 8 and dec.shape
                                       == (n, h, w, 3)),
                    "dht_forms_equal": bool(np.array_equal(dec, alt)),
                })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_frames", "fps", "implied_dht",
                         "within_tol", "dht_forms_equal"],
            )

    return docs.mapInPandas(run, schema=AVI_SCHEMA)


AVI_DUCK = """
SELECT doc_id,
       CAST(doc_id % 5 + 2 AS INT) AS n_frames,
       CAST(CASE doc_id % 3 WHEN 0 THEN 10 WHEN 1 THEN 24 ELSE 30 END
            AS INT) AS fps,
       doc_id % 2 = 1 AS implied_dht,
       TRUE AS within_tol,
       TRUE AS dht_forms_equal
FROM documents
WHERE doc_id % 13 = 6
"""


# ------------------------------------------------ ViT patch extraction
# Drives binary.patchify_rgb (the vision-pretraining input step: image
# -> non-overlapping P x P patch grid) through the REAL PNG
# encode->decode path. Every patch row carries both a plain pixel sum
# AND a position-weighted sum (weight 1 + py*P*3 + px*3 + c), so a
# transposed, mirrored, or channel-swapped patch walk cannot hash
# green — the weighted sum pins the exact (row, col, channel) layout
# the patch embedding layer will flatten. The DuckDB oracle recomputes
# both sums in closed form from the pixel formula.

PATCH_P = 8
PATCHIFY_SCHEMA = (
    "doc_id long, pi int, pj int, patch_h int, patch_w int, "
    "pix_sum bigint, pos_weighted_sum bigint"
)


def _q_vit_patchify(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import binary, png

    docs = _fanout(
        spark,
        catalog.load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 5 == 3
        ),
    )
    wgt = (
        1 + np.arange(PATCH_P * PATCH_P * 3, dtype=np.int64)
    ).reshape(PATCH_P, PATCH_P, 3)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = (d % 4 + 1) * PATCH_P
                h = (d % 3 + 1) * PATCH_P
                y, x, c = np.mgrid[0:h, 0:w, 0:3]
                arr = ((d + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)
                dec = binary.decode_any("png", png.encode_png(arr))
                grid = binary.patchify_rgb(dec, PATCH_P)
                for pi in range(grid.shape[0]):
                    for pj in range(grid.shape[1]):
                        pt = grid[pi, pj].astype(np.int64)
                        out.append({
                            "doc_id": d,
                            "pi": pi,
                            "pj": pj,
                            "patch_h": PATCH_P,
                            "patch_w": PATCH_P,
                            "pix_sum": int(pt.sum()),
                            "pos_weighted_sum": int((pt * wgt).sum()),
                        })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "pi", "pj", "patch_h", "patch_w",
                         "pix_sum", "pos_weighted_sum"],
            )

    return docs.mapInPandas(run, schema=PATCHIFY_SCHEMA)


_P = PATCH_P
_PATCH_V = (
    f"(doc_id + 3 * (pj.pj * {_P} + px) + 7 * (pi.pi * {_P} + py)"
    " + 11 * c) % 256"
)
VIT_PATCHIFY_DUCK = f"""
SELECT doc_id,
       CAST(pi.pi AS INT) AS pi,
       CAST(pj.pj AS INT) AS pj,
       CAST({_P} AS INT) AS patch_h,
       CAST({_P} AS INT) AS patch_w,
       CAST(list_sum(list_transform(generate_series(0, {_P - 1}), py ->
         list_sum(list_transform(generate_series(0, {_P - 1}), px ->
           list_sum(list_transform([0, 1, 2], c ->
             {_PATCH_V})))))) AS BIGINT) AS pix_sum,
       CAST(list_sum(list_transform(generate_series(0, {_P - 1}), py ->
         list_sum(list_transform(generate_series(0, {_P - 1}), px ->
           list_sum(list_transform([0, 1, 2], c ->
             ({_PATCH_V}) * (1 + py * {_P * 3} + px * 3 + c)))))))
         AS BIGINT) AS pos_weighted_sum
FROM documents,
     LATERAL (SELECT unnest(generate_series(0, doc_id % 3)) AS pi) pi,
     LATERAL (SELECT unnest(generate_series(0, doc_id % 4)) AS pj) pj
WHERE doc_id % 5 = 3
"""


# --------------------------------------------- spatial augmentations
# Drives binary.augment_views (flip / rot90 / center-crop — the
# training-time view set) through the real PNG path; each view row is
# gated on a pixel sum AND a position-weighted sum over the OUTPUT
# layout, so a view computed with the wrong orientation (flip axis,
# rotation direction, crop origin) cannot hash green. The oracle
# recomputes every view in closed form by index remapping.

AUGMENT_SCHEMA = (
    "doc_id long, view string, out_h int, out_w int, "
    "pix_sum bigint, pos_weighted_sum bigint"
)


def _q_augment_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import binary, png

    docs = _fanout(
        spark,
        catalog.load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 5 == 4
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = (d % 4 + 1) * 8
                h = (d % 3 + 1) * 8
                y, x, c = np.mgrid[0:h, 0:w, 0:3]
                arr = ((d + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)
                dec = binary.decode_any("png", png.encode_png(arr))
                for name, v in binary.augment_views(dec).items():
                    vi = v.astype(np.int64)
                    oh, ow = vi.shape[:2]
                    wgt = (
                        1 + np.arange(oh * ow * 3, dtype=np.int64)
                    ).reshape(oh, ow, 3)
                    out.append({
                        "doc_id": d,
                        "view": name,
                        "out_h": oh,
                        "out_w": ow,
                        "pix_sum": int(vi.sum()),
                        "pos_weighted_sum": int((vi * wgt).sum()),
                    })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "view", "out_h", "out_w",
                         "pix_sum", "pos_weighted_sum"],
            )

    return docs.mapInPandas(run, schema=AUGMENT_SCHEMA)


def _augment_duck() -> str:
    # per view: (out_h, out_w, source-pixel expr in output coords)
    # with W = 8*(doc_id%4+1), H = 8*(doc_id%3+1) and source pixel
    # p(sy, sx, c) = (doc_id + 3*sx + 7*sy + 11*c) % 256
    views = {
        "hflip": ("H", "W", "y", "W - 1 - x"),
        "vflip": ("H", "W", "H - 1 - y", "x"),
        "rot90": ("W", "H", "x", "W - 1 - y"),
        "crop": ("H // 2", "W // 2", "y + H // 4", "x + W // 4"),
    }
    selects = []
    for name, (oh, ow, sy, sx) in views.items():
        val = f"(doc_id + 3 * ({sx}) + 7 * ({sy}) + 11 * c) % 256"
        selects.append(f"""
  SELECT doc_id, '{name}' AS view,
         CAST({oh} AS INT) AS out_h, CAST({ow} AS INT) AS out_w,
         CAST(list_sum(list_transform(generate_series(0, ({oh}) - 1), y ->
           list_sum(list_transform(generate_series(0, ({ow}) - 1), x ->
             list_sum(list_transform([0, 1, 2], c ->
               {val})))))) AS BIGINT) AS pix_sum,
         CAST(list_sum(list_transform(generate_series(0, ({oh}) - 1), y ->
           list_sum(list_transform(generate_series(0, ({ow}) - 1), x ->
             list_sum(list_transform([0, 1, 2], c ->
               ({val}) * (1 + (y * ({ow}) + x) * 3 + c)))))))
           AS BIGINT) AS pos_weighted_sum
  FROM dims""")
    return (
        """
WITH dims AS (
  SELECT doc_id,
         8 * (doc_id % 3 + 1) AS H,
         8 * (doc_id % 4 + 1) AS W
  FROM documents WHERE doc_id % 5 = 4
)"""
        + "\n  UNION ALL\n".join(selects)
    )




# ------------------------------------ EXIF orientation normalization
# Tag-274 auto-rotation (round 9): cameras store the sensor image
# unrotated; 5/8 of the orientation values mean "this photo displays
# sideways or mirrored" and every geometric op downstream (tiles,
# crops, augmentations) is wrong until normalized. COMPLEMENTS the
# existing mm_exif_orientation (DNG tag write/probe + weighted
# checksum, tiff.py machinery): this query gates the JPEG/APP1 parse
# path and the lossless whole-pipeline normalize. Per doc: the
# upright gradient fixture is INVERSE-transformed into the stored
# form for orientation (doc_id % 8) + 1, round-tripped through the
# LOSSLESS PNG codec (exact pixels — so the normalized output must
# equal the formula-built upright BIT-FOR-BIT, a non-tautological
# whole-pipeline check) AND through JPEG carrying the real Exif APP1
# (gating the tag PARSE via metascrub.jpeg_orientation and a lossy
# tolerance). Output dims swap for the transpose family (o >= 5).

EXIF_ORIENT_NORM_SCHEMA = (
    "doc_id long, orientation int, out_w int, out_h int, "
    "orient_parsed int, norm_exact boolean, jpeg_within_tol boolean"
)

_ORIENT_INV = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}


def _q_exif_orientation_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from . import binary, jpeg, metascrub, png, tiff

    docs = _fanout(spark, catalog.load_table(spark, sf_dir, "documents"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 24 + 8, d % 17 + 8
                o = d % 8 + 1
                y, x = np.mgrid[0:h, 0:w]
                upright = np.stack(
                    [x * 3 + d % 100, y * 4 + d % 80, x + y + d % 50],
                    axis=2,
                ).astype(np.uint8)
                stored = tiff.apply_exif_orientation(
                    upright, _ORIENT_INV[o]
                )
                # lossless path: exact whole-pipeline equality
                dec_png = binary.decode_any("png", png.encode_png(stored))
                norm = tiff.apply_exif_orientation(dec_png, o)
                # lossy path: real Exif APP1 drives the parse
                dirty = metascrub.inject_app1(
                    jpeg.encode_jpeg(stored, quality=85),
                    metascrub.build_orientation_app1(o),
                )
                o_read = metascrub.jpeg_orientation(dirty)
                norm_j = tiff.apply_exif_orientation(
                    binary.decode_any("jpg", dirty), o_read
                )
                err = int(
                    np.abs(norm_j.astype(int) - upright.astype(int)).max()
                ) if norm_j.shape == upright.shape else 255
                out.append({
                    "doc_id": d,
                    "orientation": o,
                    "out_w": int(norm.shape[1]),
                    "out_h": int(norm.shape[0]),
                    "orient_parsed": int(o_read),
                    "norm_exact": bool(np.array_equal(norm, upright)),
                    "jpeg_within_tol": bool(err <= 24),
                })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "orientation", "out_w", "out_h",
                         "orient_parsed", "norm_exact", "jpeg_within_tol"],
            )

    return docs.mapInPandas(run, schema=EXIF_ORIENT_NORM_SCHEMA)


EXIF_ORIENT_NORM_DUCK = """
SELECT doc_id,
       CAST(doc_id % 8 + 1 AS INT) AS orientation,
       CAST(doc_id % 24 + 8 AS INT) AS out_w,
       CAST(doc_id % 17 + 8 AS INT) AS out_h,
       CAST(doc_id % 8 + 1 AS INT) AS orient_parsed,
       TRUE AS norm_exact,
       TRUE AS jpeg_within_tol
FROM documents
"""


QUERIES = {
    "mm_decode_meta": _q_decode_meta,
    "mm_vit_patchify": _q_vit_patchify,
    "mm_augment_views": _q_augment_views,
    "mm_format_convert_chain": _q_format_convert_chain,
    "mm_jpeg12_roundtrip": _q_jpeg12_roundtrip,
    "mm_wav_depths_roundtrip": _q_wav_depths_roundtrip,
    "mm_avi_mjpeg_roundtrip": _q_avi_mjpeg_roundtrip,
    "mm_audio_features": _q_audio_features,
    "mm_audio_vad_segments": _q_vad_segments,
    "mm_audio_spectral": _q_audio_spectral,
    "mm_audio_fingerprint_dups": _q_audio_fingerprint_dups,
    "mm_exif_scrub": _q_exif_scrub,
    "mm_exif_orientation_normalize": _q_exif_orientation_normalize,
    "mm_video_scene_cuts": _q_video_scene_cuts,
    "mm_audio_normalize": _q_audio_normalize,
    "mm_audio_resample": _q_audio_resample,
    "mm_scrub_routing": _q_scrub_routing,
    "mm_frame_sample": _q_frame_sample,
    "mm_png_roundtrip": _q_png_roundtrip,
    "mm_png_interlaced_roundtrip": _q_png_interlaced_roundtrip,
    "mm_png_depths_roundtrip": _q_png_depths_roundtrip,
    "mm_bmp_depths_roundtrip": _q_bmp_depths_roundtrip,
    "mm_wav_roundtrip": _q_wav_roundtrip,
    "mm_jpeg_roundtrip": _q_jpeg_roundtrip,
    "mm_resize_roundtrip": _q_resize_roundtrip,
    "mm_webp_roundtrip": _q_webp_roundtrip,
    "mm_tile_checksum": _q_tile_checksum,
    "mm_progressive_roundtrip": _q_progressive_roundtrip,
    "mm_vp8_roundtrip": _q_vp8_roundtrip,
    "mm_heif_roundtrip": _q_heif_roundtrip,
    "mm_dng_lossless_roundtrip": _q_dng_roundtrip,
    "mm_dng_tiled_roundtrip": _q_dng_tiled_roundtrip,
    "mm_cr2_lossless_roundtrip": _q_cr2_roundtrip,
    "mm_nef_packed_roundtrip": _q_nef_roundtrip,
    "mm_nef_compressed_roundtrip": _q_nef_compressed_roundtrip,
    "mm_arw_roundtrip": _q_arw_roundtrip,
    "mm_arw_compressed_roundtrip": _q_arw_compressed_roundtrip,
    "mm_exif_orientation": _q_exif_orientation,
}
ORACLES = {
    "mm_decode_meta": DECODE_META_DUCK,
    "mm_vit_patchify": VIT_PATCHIFY_DUCK,
    "mm_augment_views": _augment_duck(),
    "mm_format_convert_chain": CONVERT_CHAIN_DUCK,
    "mm_jpeg12_roundtrip": JPEG12_DUCK,
    "mm_wav_depths_roundtrip": WAV_DEPTHS_DUCK,
    "mm_avi_mjpeg_roundtrip": AVI_DUCK,
    "mm_audio_features": AUDIO_FEATURES_DUCK,
    "mm_audio_vad_segments": VAD_SEGMENTS_DUCK,
    "mm_audio_spectral": _audio_spectral_duck(),
    "mm_audio_fingerprint_dups": _audio_fingerprint_duck(),
    "mm_exif_scrub": _exif_scrub_duck(),
    "mm_exif_orientation_normalize": EXIF_ORIENT_NORM_DUCK,
    "mm_video_scene_cuts": VIDEO_SCENE_CUTS_DUCK,
    "mm_audio_normalize": AUDIO_NORMALIZE_DUCK,
    "mm_audio_resample": AUDIO_RESAMPLE_DUCK,
    "mm_scrub_routing": SCRUB_ROUTING_DUCK,
    "mm_frame_sample": FRAME_SAMPLE_DUCK,
    "mm_png_roundtrip": PNG_ROUNDTRIP_DUCK,
    "mm_png_interlaced_roundtrip": PNG_INTERLACED_ROUNDTRIP_DUCK,
    "mm_png_depths_roundtrip": PNG_DEPTHS_DUCK,
    "mm_bmp_depths_roundtrip": BMP_DEPTHS_DUCK,
    "mm_wav_roundtrip": WAV_ROUNDTRIP_DUCK,
    "mm_jpeg_roundtrip": JPEG_ROUNDTRIP_DUCK,
    "mm_resize_roundtrip": RESIZE_ROUNDTRIP_DUCK,
    "mm_webp_roundtrip": WEBP_ROUNDTRIP_DUCK,
    "mm_tile_checksum": _tile_checksum_duck(),
    "mm_progressive_roundtrip": PROG_ROUNDTRIP_DUCK,
    "mm_vp8_roundtrip": VP8_ROUNDTRIP_DUCK,
    "mm_heif_roundtrip": HEIF_ROUNDTRIP_DUCK,
    "mm_dng_lossless_roundtrip": DNG_ROUNDTRIP_DUCK,
    "mm_dng_tiled_roundtrip": DNG_TILED_DUCK,
    "mm_cr2_lossless_roundtrip": CR2_ROUNDTRIP_DUCK,
    "mm_nef_packed_roundtrip": NEF_ROUNDTRIP_DUCK,
    "mm_nef_compressed_roundtrip": NEFC_ROUNDTRIP_DUCK,
    "mm_arw_roundtrip": ARW_ROUNDTRIP_DUCK,
    "mm_arw_compressed_roundtrip": ARW2_ROUNDTRIP_DUCK,
    "mm_exif_orientation": EXIF_ORIENT_DUCK,
}
