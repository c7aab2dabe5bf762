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
    data[30] = 3  # compression=BI_BITFIELDS
    with pytest.raises(NotImplementedError, match="compression 3"):
        codecs_extra.decode_bmp(bytes(data))
    data[30] = 1  # BI_RLE8 on a 24-bit image is malformed
    with pytest.raises(ValueError, match="invalid for 24 bpp"):
        codecs_extra.decode_bmp(bytes(data))
    data[30] = 0
    data[28] = 2  # bpp=2 is not a legal BMP depth
    with pytest.raises(NotImplementedError, match="2 bpp"):
        codecs_extra.decode_bmp(bytes(data))


# ------------------------------------------- BMP depth matrix (round 8)


def _build_bmp(w, h, bpp, payload_rows, palette=None, core=False,
               top_down=False):
    """Hand-build an uncompressed BMP. ``payload_rows`` is the pixel
    array in ROW 0 = TOP order; storage order follows ``top_down``."""
    stride = ((w * bpp + 31) // 32) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : payload_rows.shape[1]] = payload_rows
    if not top_down:
        rows = rows[::-1]
    pal = b""
    if palette is not None:
        entry = 3 if core else 4
        pal_arr = np.zeros((len(palette), entry), dtype=np.uint8)
        pal_arr[:, :3] = palette[:, ::-1]  # RGB -> BGR(X)
        pal = pal_arr.tobytes()
    if core:
        info = struct.pack("<IhhHH", 12, w, -h if top_down else h, 1, bpp)
    else:
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp,
            0, 0, 0, 0, 0, 0,
        )
    data_offset = 14 + len(info) + len(pal)
    head = b"BM" + struct.pack(
        "<IHHI", data_offset + rows.size, 0, 0, data_offset
    )
    return head + info + pal + rows.tobytes()


def test_bmp_32bpp_decode_drops_alpha():
    rng = np.random.default_rng(3)
    h, w = 5, 3
    arr = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    payload = arr[:, :, [2, 1, 0, 3]].reshape(h, w * 4)  # RGBA -> BGRA
    for top_down in (False, True):
        data = _build_bmp(w, h, 32, payload, top_down=top_down)
        assert np.array_equal(
            codecs_extra.decode_bmp(data), arr[:, :, :3]
        ), top_down


@pytest.mark.parametrize("bpp", [1, 4, 8])
@pytest.mark.parametrize("core", [False, True])
def test_bmp_palette_depths(bpp, core):
    rng = np.random.default_rng(bpp * 10 + core)
    h, w = 6, 11  # w chosen so sub-byte rows have slack bits
    n = 1 << bpp
    palette = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, (h, w), dtype=np.uint8)
    if bpp == 8:
        payload = idx
    elif bpp == 4:
        padded = np.zeros((h, w + w % 2), dtype=np.uint8)
        padded[:, :w] = idx
        payload = (padded[:, 0::2] << 4) | padded[:, 1::2]
    else:
        payload = np.packbits(idx, axis=1)  # MSB-first, left pixel first
    data = _build_bmp(w, h, bpp, payload, palette=palette, core=core)
    assert np.array_equal(codecs_extra.decode_bmp(data), palette[idx])


def test_bmp_core_header_24bpp():
    arr = _rand(4, 5, seed=11)
    payload = arr[:, :, ::-1].reshape(4, 15)
    data = _build_bmp(5, 4, 24, payload, core=True)
    assert np.array_equal(codecs_extra.decode_bmp(data), arr)


def test_bmp_palette_short_color_table():
    # biClrUsed < 2^bpp: indices past the table clip to the last entry
    palette = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    idx = np.array([[0, 1, 3]], dtype=np.uint8)
    data = bytearray(
        _build_bmp(3, 1, 8, idx, palette=palette)
    )
    struct.pack_into("<I", data, 14 + 32, 2)  # biClrUsed = 2
    out = codecs_extra.decode_bmp(bytes(data))
    assert np.array_equal(out[0, 0], palette[0])
    assert np.array_equal(out[0, 1], palette[1])
    assert np.array_equal(out[0, 2], palette[1])  # clipped


# ------------------------------------------------- PPM maxval (round 8)


def test_ppm_16bit_maxval():
    rng = np.random.default_rng(4)
    h, w = 3, 4
    vals = rng.integers(0, 65536, (h, w, 3)).astype(np.uint16)
    data = f"P6\n{w} {h}\n65535\n".encode() + vals.astype(">u2").tobytes()
    expect = ((vals.astype(np.uint32) * 255 + 32767) // 65535).astype(
        np.uint8
    )
    assert np.array_equal(codecs_extra.decode_ppm(data), expect)


@pytest.mark.parametrize("maxval", [1, 15, 100, 254])
def test_ppm_small_maxval_rescales(maxval):
    rng = np.random.default_rng(maxval)
    h, w = 2, 5
    vals = rng.integers(0, maxval + 1, (h, w, 3)).astype(np.uint8)
    data = f"P6\n{w} {h}\n{maxval}\n".encode() + vals.tobytes()
    expect = (
        (vals.astype(np.uint32) * 255 + maxval // 2) // maxval
    ).astype(np.uint8)
    out = codecs_extra.decode_ppm(data)
    assert np.array_equal(out, expect)
    assert out.max() <= 255 and (maxval == 1 or out.dtype == np.uint8)


def test_ppm_maxval_out_of_range_raises():
    with pytest.raises(ValueError, match="maxval"):
        codecs_extra.decode_ppm(b"P6\n1 1\n70000\n\x00\x00\x00\x00\x00\x00")


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


def test_encode_bmp_ex_matches_hand_builder_and_roundtrips():
    rng = np.random.default_rng(99)
    # palette depths roundtrip through the decoder
    for bpp in (1, 4, 8):
        n = 1 << bpp
        palette = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, (5, 9), dtype=np.uint8)
        for core in (False, True):
            data = codecs_extra.encode_bmp_ex(
                idx, bpp=bpp, palette=palette, core=core
            )
            assert np.array_equal(
                codecs_extra.decode_bmp(data), palette[idx]
            ), (bpp, core)
    # 24 bpp ex-encoder bytes match the canonical encoder's pixels
    arr = _rand(4, 5, seed=1)
    assert np.array_equal(
        codecs_extra.decode_bmp(codecs_extra.encode_bmp_ex(arr, bpp=24)),
        arr,
    )
    # 32 bpp top-down drops alpha
    rgba = rng.integers(0, 256, (3, 4, 4), dtype=np.uint8)
    data = codecs_extra.encode_bmp_ex(rgba, bpp=32, top_down=True)
    assert np.array_equal(codecs_extra.decode_bmp(data), rgba[:, :, :3])
    with pytest.raises(ValueError, match="bottom-up"):
        codecs_extra.encode_bmp_ex(rgba, bpp=32, core=True, top_down=True)


# --------------------------------------------------- BMP RLE (round 8)


def _rle_bmp(w, h, bpp, stream, palette):
    """Wrap a hand-built RLE byte stream in a BMP container."""
    pal_arr = np.zeros((len(palette), 4), dtype=np.uint8)
    pal_arr[:, :3] = palette[:, ::-1]
    pal = pal_arr.tobytes()
    comp = 1 if bpp == 8 else 2
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp,
                       len(stream), 0, 0, len(palette), 0)
    off = 14 + 40 + len(pal)
    return (b"BM" + struct.pack("<IHHI", off + len(stream), 0, 0, off)
            + info + pal + stream)


def test_bmp_rle8_hand_built_escapes():
    # 4x3 (storage bottom-up): runs, absolute (odd n -> pad byte),
    # early EOL (rest of row stays index 0), delta skip, early EOF
    palette = np.arange(30, dtype=np.uint8).reshape(10, 3)
    stream = bytes((
        2, 5,              # storage row 0 (bottom): 5 5
        0, 3, 7, 8, 9, 0,  # absolute: 7 8 9 (+ pad byte)
        0, 0,              # EOL
        1, 4, 0, 0,        # row 1: 4, then EOL -> rest 0
        0, 2, 2, 0,        # delta: skip to x=2, same row (top storage)
        2, 6,              # 6 6 at x=2..3
        0, 1,              # EOF
    ))
    data = _rle_bmp(4, 3, 8, stream, palette)
    idx = np.array([          # image order (top row first after flip)
        [0, 0, 6, 6],         # storage row 2
        [4, 0, 0, 0],         # storage row 1
        [5, 5, 7, 8],         # storage row 0 (w=4 clips the 9)
    ])
    assert np.array_equal(codecs_extra.decode_bmp(data), palette[idx])


def test_bmp_rle4_alternating_nibbles():
    palette = (np.arange(16)[:, None] * np.array([3, 5, 7])
               % 256).astype(np.uint8)
    stream = bytes((
        5, 0xAB,           # A B A B A
        0, 3, 0xCD, 0xE0,  # absolute: C D E (2 bytes, already aligned)
        0, 0,              # EOL
        3, 0x70,           # 7 0 7
        0, 1,              # EOF -> row stays 0 after x=3
    ))
    data = _rle_bmp(8, 2, 4, stream, palette)
    idx = np.array([
        [0x7, 0x0, 0x7, 0, 0, 0, 0, 0],
        [0xA, 0xB, 0xA, 0xB, 0xA, 0xC, 0xD, 0xE],
    ])
    assert np.array_equal(codecs_extra.decode_bmp(data), palette[idx])


@pytest.mark.parametrize("bpp", [8, 4])
def test_bmp_rle_encoder_roundtrip(bpp):
    rng = np.random.default_rng(bpp)
    n = 1 << bpp
    palette = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    # runs + noise so RLE8 exercises both short and long runs
    idx = rng.integers(0, n, (7, 13), dtype=np.uint8)
    idx[2, :] = 3          # full-row run
    idx[4, 1:12] = idx[4, 1]
    data = codecs_extra.encode_bmp_rle(idx, palette, bpp=bpp)
    assert np.array_equal(codecs_extra.decode_bmp(data), palette[idx])


def test_bmp_rle_invalid_combos():
    palette = np.zeros((2, 3), dtype=np.uint8)
    data = bytearray(_rle_bmp(2, 2, 8, b"\x00\x01", palette))
    struct.pack_into("<i", data, 22, -2)  # negative height = top-down
    with pytest.raises(ValueError, match="top-down"):
        codecs_extra.decode_bmp(bytes(data))
    data = bytearray(_rle_bmp(2, 2, 8, b"\x00\x01", palette))
    struct.pack_into("<H", data, 28, 4)  # bpp=4 with BI_RLE8
    with pytest.raises(ValueError, match="invalid for 4 bpp"):
        codecs_extra.decode_bmp(bytes(data))
    struct.pack_into("<I", data, 30, 3)  # BI_BITFIELDS
    with pytest.raises(NotImplementedError, match="compression 3"):
        codecs_extra.decode_bmp(bytes(data))


def test_bmp_ppm_fail_controlled_on_fuzz():
    """Garbage / truncated / dims-bombed containers must raise (F7
    quarantine catches broadly) and must NOT allocate before the
    dims check — the RLE path zero-fills h x w up front, so the cap
    is load-bearing there (same bound as rawvendor.MAX_RAW_PIXELS)."""
    rng = np.random.default_rng(77)
    for n in (0, 3, 16, 200):
        blob = b"BM" + rng.integers(0, 256, size=n).astype(np.uint8).tobytes()
        with pytest.raises(Exception):
            codecs_extra.decode_bmp(blob)
        with pytest.raises(Exception):
            codecs_extra.decode_ppm(b"P6" + blob[2:])
    # dims bomb: 65535 x 65535 uncompressed and RLE
    arr = _rand(4, 4, seed=1)
    bomb = bytearray(codecs_extra.encode_bmp(arr))
    struct.pack_into("<ii", bomb, 18, 65535, 65535)
    with pytest.raises(ValueError, match="implausible"):
        codecs_extra.decode_bmp(bytes(bomb))
    palette = np.zeros((256, 3), dtype=np.uint8)
    idx = np.zeros((4, 4), dtype=np.uint8)
    rle_bomb = bytearray(codecs_extra.encode_bmp_rle(idx, palette))
    struct.pack_into("<ii", rle_bomb, 18, 60000, 60000)
    with pytest.raises(ValueError, match="implausible"):
        codecs_extra.decode_bmp(bytes(rle_bomb))
    with pytest.raises(ValueError, match="implausible"):
        codecs_extra.decode_ppm(b"P6\n60000 60000\n255\n")
    # truncated RLE streams terminate cleanly (zero-fill, no hang)
    full = codecs_extra.encode_bmp_rle(
        rng.integers(0, 256, (6, 9), dtype=np.uint8), palette
    )
    (data_off,) = struct.unpack("<I", full[10:14])
    for cut in range(data_off, len(full), 7):
        out = codecs_extra.decode_bmp(full[:cut])
        assert out.shape == (6, 9, 3)
