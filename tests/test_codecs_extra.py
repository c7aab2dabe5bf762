"""BMP / PPM roundtrips, GIF first-frame decode, cross-format convert.

S4/S5 upgrades: BMP+PPM are full codecs; GIF first-frame decode gives
real parity with the reference's animated handling
(/root/reference/modules/batch_processor.py:352-357 — first frame
only). The GIF bytes here are built by a minimal test-only writer
(clear-code-per-pixel LZW), so the decoder is tested against
independently constructed streams, not its own output.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dataset_batch_processor_spark.multimodal import binary, codecs_extra, gif


def _rand(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


# ------------------------------------------------------------- BMP / PPM


@pytest.mark.parametrize("h,w", [(1, 1), (7, 5), (16, 16), (3, 10)])
def test_bmp_roundtrip(h, w):
    arr = _rand(h, w, seed=h * 100 + w)
    out = codecs_extra.decode_bmp(codecs_extra.encode_bmp(arr))
    assert np.array_equal(out, arr)


def test_bmp_row_padding_is_correct():
    # w=5 -> 15-byte rows padded to 16: padding must not leak into pixels
    arr = _rand(4, 5, seed=9)
    data = codecs_extra.encode_bmp(arr)
    (file_size,) = struct.unpack("<I", data[2:6])
    assert file_size == len(data) == 54 + 4 * 16
    assert np.array_equal(codecs_extra.decode_bmp(data), arr)


def test_ppm_roundtrip_and_comment_header():
    arr = _rand(6, 8, seed=2)
    data = codecs_extra.encode_ppm(arr)
    assert np.array_equal(codecs_extra.decode_ppm(data), arr)
    # comments in the header are legal Netpbm
    with_comment = data.replace(b"P6\n", b"P6\n# a comment\n", 1)
    assert np.array_equal(codecs_extra.decode_ppm(with_comment), arr)


def test_bmp_unsupported_raises():
    with pytest.raises(ValueError):
        codecs_extra.decode_bmp(b"nope")
    arr = _rand(2, 2)
    data = bytearray(codecs_extra.encode_bmp(arr))
    data[28] = 8  # bpp=8
    with pytest.raises(NotImplementedError):
        codecs_extra.decode_bmp(bytes(data))


# ------------------------------------------------------------------ GIF


def _pack_lzw_clear_per_code(indices, min_code_size):
    """Test-only LZW writer: CLEAR before every pixel code keeps the
    code size fixed at min_code_size+1 (decoder-independent)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    acc = acc_bits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += code_size
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    emit(clear)
    for i in indices:
        emit(int(i))
        emit(clear)
    emit(end)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _make_gif(idx: np.ndarray, palette: np.ndarray, interlace=False,
              animated=False) -> bytes:
    h, w = idx.shape
    n = len(palette)
    pbits = max(1, (n - 1).bit_length())
    pal = np.zeros((2 ** pbits, 3), dtype=np.uint8)
    pal[:n] = palette
    min_code_size = max(2, pbits)
    rows = idx
    if interlace:
        order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                 for y in range(start, h, step)]
        rows = idx[order]
    lzw = _pack_lzw_clear_per_code(rows.ravel(), min_code_size)
    sub_blocks = b""
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        sub_blocks += bytes([len(chunk)]) + chunk
    img = (
        b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        + bytes([min_code_size])
        + sub_blocks
        + b"\x00"
    )
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # graphic control ext
    stream = (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (pbits - 1), 0, 0)
        + pal.tobytes()
        + gce
        + img
    )
    if animated:
        stream += gce + img  # second identical frame
    return stream + b"\x3b"


PALETTE = np.array(
    [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0],
     [0, 255, 255], [80, 40, 20], [1, 2, 3], [200, 200, 200]],
    dtype=np.uint8,
)


def test_gif_decode_basic():
    rng = np.random.default_rng(4)
    idx = rng.integers(0, 8, (11, 13), dtype=np.uint8)
    out = gif.decode_gif(_make_gif(idx, PALETTE))
    assert np.array_equal(out, PALETTE[idx])


def test_gif_decode_interlaced():
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 8, (16, 7), dtype=np.uint8)
    out = gif.decode_gif(_make_gif(idx, PALETTE, interlace=True))
    assert np.array_equal(out, PALETTE[idx])


def test_gif_animated_takes_first_frame():
    rng = np.random.default_rng(6)
    idx = rng.integers(0, 8, (9, 9), dtype=np.uint8)
    out = gif.decode_gif(_make_gif(idx, PALETTE, animated=True))
    assert np.array_equal(out, PALETTE[idx])


def test_gif_errors():
    with pytest.raises(ValueError):
        gif.decode_gif(b"JIF89a....")
    with pytest.raises(ValueError):
        gif.decode_gif(b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0, 0, 0) + b"\x3b")


def test_gif_header_probe_agrees():
    from dataset_batch_processor_spark.sources import images

    idx = np.zeros((5, 12), dtype=np.uint8)
    assert images.parse_gif_header(_make_gif(idx, PALETTE)) == (12, 5)


# ------------------------------------------- cross-format via the registry


def test_registry_sniffing_all_new_formats():
    arr = _rand(6, 6, seed=11)
    assert np.array_equal(binary.decode_any("xyz", codecs_extra.encode_bmp(arr)), arr)
    assert np.array_equal(binary.decode_any("xyz", codecs_extra.encode_ppm(arr)), arr)
    idx = np.random.default_rng(7).integers(0, 8, (4, 4), dtype=np.uint8)
    assert np.array_equal(
        binary.decode_any("xyz", _make_gif(idx, PALETTE)), PALETTE[idx]
    )


def test_cross_format_convert_chain(spark):
    """S3/K1 conversion across genuinely different containers:
    GIF -> BMP -> PPM -> PNG, pixel-identical throughout."""
    from dataset_batch_processor_spark.multimodal import png

    idx = np.random.default_rng(8).integers(0, 8, (10, 10), dtype=np.uint8)
    expected = PALETTE[idx]
    df = spark.createDataFrame(
        [("g", _make_gif(idx, PALETTE), "gif")],
        "id string, content binary, fmt string",
    )
    bmp_out = binary.convert_batch(df, "bmp").collect()[0]
    assert bmp_out.error is None
    df2 = spark.createDataFrame(
        [("g", bytes(bmp_out.content), "bmp")],
        "id string, content binary, fmt string",
    )
    ppm_out = binary.convert_batch(df2, "ppm").collect()[0]
    assert ppm_out.error is None
    df3 = spark.createDataFrame(
        [("g", bytes(ppm_out.content), "ppm")],
        "id string, content binary, fmt string",
    )
    png_out = binary.convert_batch(df3, "png").collect()[0]
    assert png_out.error is None
    assert np.array_equal(png.decode_png(bytes(png_out.content)), expected)


def test_gif_early_end_code_is_truncation_error():
    # An LZW stream that emits end_code after only half the pixels
    # must raise decode_gif's truncated-stream ValueError (quarantine
    # contract), not return uninitialized garbage pixels.
    idx = np.ones((6, 6), dtype=np.uint8)
    h, w = idx.shape
    pbits, min_code_size = 3, 3
    pal = np.zeros((8, 3), dtype=np.uint8)
    pal[:8] = PALETTE
    lzw = _pack_lzw_clear_per_code(idx.ravel()[: (h * w) // 2], min_code_size)
    sub = b"".join(
        bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    stream = (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (pbits - 1), 0, 0)
        + pal.tobytes()
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code_size])
        + sub
        + b"\x00\x3b"
    )
    with pytest.raises(ValueError, match="truncated"):
        gif.decode_gif(stream)


def test_registered_codec_overrides_sniffed_builtin():
    # register_codec must win even when magic-byte sniffing identifies
    # the format (e.g. a real libjpeg binding replacing the pure-Python
    # decoder for content whose magic matches).
    arr = _rand(3, 3, seed=21)
    payload = codecs_extra.encode_bmp(arr)
    sentinel = np.zeros((1, 1, 3), dtype=np.uint8)
    try:
        binary.register_codec("bmp", lambda b: sentinel)
        assert binary.decode_any("bmp", payload) is sentinel
        # wrong extension, sniffed content: override still reached
        assert binary.decode_any("xyz", payload) is sentinel
    finally:
        binary.register_codec("bmp", codecs_extra.decode_bmp)
    assert np.array_equal(binary.decode_any("xyz", payload), arr)
