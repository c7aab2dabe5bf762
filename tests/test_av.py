"""Audio/video multimodal plumbing: real toy codecs, stub dispatch,
flat-map frame sampling feeding the image pipeline."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from dataset_batch_processor_spark.multimodal import av
from dataset_batch_processor_spark.multimodal import binary as mm


def test_rawpcm_roundtrip():
    s = (np.sin(np.linspace(0, 20, 1600)) * 10000).astype(np.int16)
    back, rate = av.decode_rawpcm(av.encode_rawpcm(s, 16000))
    assert rate == 16000 and np.array_equal(back, s)


def test_audio_features(spark):
    s = np.full(8000, 1000, dtype=np.int16)
    rows = [
        Row(id="tone", fmt="rawpcm", content=bytearray(av.encode_rawpcm(s, 8000))),
        Row(id="stub", fmt="mp3", content=bytearray(b"ID3junk")),
    ]
    got = {r.id: r for r in av.audio_features(spark.createDataFrame(rows)).collect()}
    assert got["tone"].duration_s == pytest.approx(1.0)
    assert got["tone"].rms == pytest.approx(1000.0)
    assert got["tone"].peak == 1000
    assert "NotImplementedError" in got["stub"].error


def test_frame_sampling_feeds_image_pipeline(spark):
    frames = (np.arange(12 * 4 * 4 * 3, dtype=np.int64) % 251).astype(
        np.uint8
    ).reshape(12, 4, 4, 3)
    rows = [Row(id="v", fmt="rawvid", content=bytearray(av.encode_rawvid(frames, fps=6)))]
    out = av.sample_frames(spark.createDataFrame(rows), every_n=4).collect()
    assert [r.frame_idx for r in sorted(out, key=lambda r: r.frame_idx)] == [0, 4, 8]
    assert [r.ts_s for r in sorted(out, key=lambda r: r.frame_idx)] == [0.0, 4 / 6, 8 / 6]
    # each sampled frame is a valid image payload for the image layer
    f4 = next(r for r in out if r.frame_idx == 4)
    assert np.array_equal(mm.decode_rawrgb(bytes(f4.content)), frames[4])


def test_video_stub_quarantined(spark):
    rows = [Row(id="x", fmt="mp4", content=bytearray(b"\x00\x00\x00 ftypmp42"))]
    out = av.sample_frames(spark.createDataFrame(rows)).collect()
    assert len(out) == 1 and "NotImplementedError" in out[0].error


def test_wav_roundtrip_and_features(spark):
    rng = np.random.default_rng(12)
    samples = rng.integers(-32768, 32768, 1600, dtype=np.int16)
    data = av.encode_wav(samples, sample_rate=8000)
    dec, rate = av.decode_wav(data)
    assert rate == 8000 and np.array_equal(dec, samples)
    df = spark.createDataFrame(
        [("w", "wav", data)], "id string, fmt string, content binary"
    )
    row = av.audio_features(df).collect()[0]
    assert row.error is None
    assert (row.sample_rate, row.n_samples) == (8000, 1600)
    assert abs(row.duration_s - 0.2) < 1e-9


def test_wav_stereo_downmixes_to_channel0():
    import io
    import wave

    left = np.arange(100, dtype=np.int16)
    right = -left
    inter = np.empty(200, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(inter.tobytes())
    dec, rate = av.decode_wav(buf.getvalue())
    assert np.array_equal(dec, left)


def test_wav_8bit_decodes():
    # round 8: 8-bit unsigned PCM is part of the decode matrix now
    # (stdlib-wave-produced container, silence = bias 0x00 -> -32768)
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([0, 128, 255]) * 2)
    out, rate = av.decode_wav(buf.getvalue())
    assert rate == 8000
    assert np.array_equal(
        out, np.array([-32768, 0, 32512] * 2, dtype=np.int16)
    )


# -------------------------------------- WAV format matrix (round 8)


def _wav(code, bits, payload, nch=1, rate=16000):
    import struct

    fmt = struct.pack(
        "<HHIIHH", code, nch, rate, rate * nch * bits // 8,
        nch * bits // 8, bits,
    )
    out = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        out += b"\x00"  # chunk word alignment
    return b"RIFF" + struct.pack("<I", len(out)) + out


def test_g711_expand_compress_inverse():
    codes = np.arange(256, dtype=np.uint8)
    # A-law is a true involution over all 256 codes
    assert np.array_equal(av.alaw_compress(av.alaw_expand(codes)), codes)
    # mu-law: 0x7F and 0xFF both decode to 0 (negative-zero alias);
    # the VALUE-level invariant holds for every code
    rt = av.mulaw_compress(av.mulaw_expand(codes))
    assert np.array_equal(av.mulaw_expand(rt), av.mulaw_expand(codes))
    assert np.array_equal(
        rt[codes != 0x7F], codes[codes != 0x7F]
    )
    # full-scale endpoints per G.711 (transmitted MSB=1 is positive)
    assert av.mulaw_expand(np.array([0x80], dtype=np.uint8))[0] == 32124
    assert av.mulaw_expand(np.array([0x00], dtype=np.uint8))[0] == -32124
    assert av.mulaw_expand(np.array([0xFF], dtype=np.uint8))[0] == 0
    # A-law ITU endpoints (g711.c lineage: post-XOR-0x55 sign bit SET
    # is POSITIVE) — round 9 sign-convention fix
    assert av.alaw_expand(np.array([0xD5], dtype=np.uint8))[0] == 8
    assert av.alaw_expand(np.array([0x55], dtype=np.uint8))[0] == -8
    assert av.alaw_expand(np.array([0xAA], dtype=np.uint8))[0] == 32256
    assert av.alaw_expand(np.array([0x2A], dtype=np.uint8))[0] == -32256
    assert av.alaw_compress(np.array([0], dtype=np.int16))[0] == 0xD5
    # quantization error relative bound (segment size / 2)
    x = np.random.default_rng(0).integers(-32000, 32000, 4000).astype(
        np.int16
    )
    for comp, expand, tol in (
        (av.mulaw_compress, av.mulaw_expand, 0.04),
        (av.alaw_compress, av.alaw_expand, 0.07),
    ):
        err = np.abs(expand(comp(x)).astype(int) - x.astype(int))
        rel = err / np.maximum(np.abs(x.astype(int)), 256)
        assert rel.max() <= tol, rel.max()


def test_wav_pcm_depth_matrix():
    import struct

    s16 = np.array([-32768, -1000, 0, 1000, 32767], dtype=np.int16)
    out, r = av.decode_wav(_wav(1, 16, s16.tobytes()))
    assert np.array_equal(out, s16) and r == 16000
    u8 = np.array([0, 128, 255], dtype=np.uint8)
    out, _ = av.decode_wav(_wav(1, 8, u8.tobytes()))
    assert np.array_equal(
        out, np.array([-32768, 0, 32512], dtype=np.int16)
    )
    v24 = np.array([-(1 << 23), -256, 0, 256, (1 << 23) - 1],
                   dtype=np.int64)
    payload = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in v24
    )
    out, _ = av.decode_wav(_wav(1, 24, payload))
    assert np.array_equal(out, (v24 >> 8).astype(np.int16))
    v32 = np.array([-(1 << 31), 0, (1 << 31) - 1], dtype=np.int64)
    out, _ = av.decode_wav(
        _wav(1, 32, np.array(v32, dtype="<i4").tobytes())
    )
    assert np.array_equal(out, (v32 >> 16).astype(np.int16))
    del struct


def test_wav_float_g711_extensible_and_stereo():
    import struct

    f = np.array([-1.5, -0.5, 0.0, 0.25, 2.0], dtype="<f4")
    out, _ = av.decode_wav(_wav(3, 32, f.tobytes()))
    assert np.array_equal(
        out, np.array([-32767, -16384, 0, 8192, 32767], dtype=np.int16)
    )
    out, _ = av.decode_wav(_wav(3, 64, f.astype("<f8").tobytes()))
    assert out[0] == -32767 and out[-1] == 32767
    s16 = np.array([-32768, -1000, 0, 1000, 32767], dtype=np.int16)
    out, _ = av.decode_wav(_wav(7, 8, av.mulaw_compress(s16).tobytes()))
    assert np.array_equal(out, av.mulaw_expand(av.mulaw_compress(s16)))
    out, _ = av.decode_wav(_wav(6, 8, av.alaw_compress(s16).tobytes()))
    assert np.array_equal(out, av.alaw_expand(av.alaw_compress(s16)))
    # WAVE_FORMAT_EXTENSIBLE wrapper resolves the sub-format
    fmt_ext = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        # cbSize, validBitsPerSample, channelMask, then the GUID whose
        # first two bytes carry the real format code
        + struct.pack("<HHI", 22, 16, 0)
        + struct.pack("<H", 1) + b"\x00" * 14
    )
    data = s16.tobytes()
    blob = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_ext)) + fmt_ext
            + b"data" + struct.pack("<I", len(data)) + data)
    out, r = av.decode_wav(b"RIFF" + struct.pack("<I", len(blob)) + blob)
    assert np.array_equal(out, s16) and r == 8000
    st = np.array([1, -1, 2, -2, 3, -3], dtype=np.int16)
    out, _ = av.decode_wav(_wav(1, 16, st.tobytes(), nch=2))
    assert np.array_equal(out, np.array([1, 2, 3], dtype=np.int16))


def test_wav_unknown_code_quarantines():
    with pytest.raises(NotImplementedError, match="85"):
        av.decode_wav(_wav(85, 16, b"\x00\x00"))  # MP3-in-WAV
    with pytest.raises(ValueError):
        av.decode_wav(b"RIFX1234WAVE")


# ------------------------------------- MJPEG-in-AVI video (round 8)


def _ramp_frames(n, h, w, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([
        np.stack(
            [x * 3 + k * 10 + seed, y * 4 + k * 5, x + y + k * 7], axis=2
        ).astype(np.uint8)
        for k in range(n)
    ])


@pytest.mark.parametrize("strip_dht", [False, True])
def test_avi_mjpeg_roundtrip(strip_dht):
    frames = _ramp_frames(4, 16, 24)
    data = av.encode_avi_mjpeg(frames, fps=12, strip_dht=strip_dht)
    dec, fps = av.decode_avi_mjpeg(data)
    assert dec.shape == frames.shape and fps == 12
    assert np.abs(dec.astype(int) - frames.astype(int)).max() <= 8
    # registry path
    dec2, fps2 = av.VIDEO_CODECS["avi"](data)
    assert np.array_equal(dec, dec2) and fps2 == 12


def test_avi_implied_dht_form_decodes_identically():
    frames = _ramp_frames(3, 8, 8, seed=5)
    d1, _ = av.decode_avi_mjpeg(av.encode_avi_mjpeg(frames, fps=10))
    d2, _ = av.decode_avi_mjpeg(
        av.encode_avi_mjpeg(frames, fps=10, strip_dht=True)
    )
    assert np.array_equal(d1, d2)


def test_avi_dht_detection_is_segment_aware():
    """Round 9: DHT presence/stripping uses a real T.81 marker walk.
    A frame whose COM payload contains the raw byte pair FF C4 must
    still be recognized as implied-DHT (and get the Annex-K splice);
    the old substring scan skipped the splice and the frame failed to
    decode. The encoder-side strip must likewise not corrupt a frame
    by 'stripping' a false match inside another segment."""
    import struct

    frames = _ramp_frames(2, 8, 8, seed=3)
    from dataset_batch_processor_spark.multimodal.jpeg import encode_jpeg

    decoy = b"\xff\xfe" + struct.pack(">H", 6) + b"\xff\xc4zz"  # COM
    plain = encode_jpeg(frames[0], quality=90)
    stripped = av._jpeg_strip_dht(plain)
    trap = stripped[:2] + decoy + stripped[2:]
    assert b"\xff\xc4" in trap and not av._jpeg_has_dht(trap)
    # hand-build an AVI around the trap frame: decode must splice
    good = av.encode_avi_mjpeg(frames[:1], fps=10)
    i = bytes(good).index(b"00dc")
    (old_sz,) = struct.unpack("<I", good[i + 4 : i + 8])
    pay = trap + (b"\x00" if len(trap) % 2 else b"")
    patched = (good[:i] + b"00dc" + struct.pack("<I", len(trap)) + pay
               + good[i + 8 + old_sz + (old_sz & 1):])
    # fix the movi LIST size (chunk length delta)
    m = patched.index(b"LIST", 12)
    while patched[m + 8 : m + 12] != b"movi":
        m = patched.index(b"LIST", m + 4)
    delta = (8 + len(pay)) - (8 + old_sz + (old_sz & 1))
    (lsz,) = struct.unpack("<I", patched[m + 4 : m + 8])
    patched = (patched[: m + 4] + struct.pack("<I", lsz + delta)
               + patched[m + 8 :])
    patched = (patched[:4]
               + struct.pack("<I", struct.unpack("<I", patched[4:8])[0]
                             + delta)
               + patched[8:])
    dec, _ = av.decode_avi_mjpeg(bytes(patched))
    assert np.abs(dec[0].astype(int) - frames[0].astype(int)).max() <= 8
    # strip path: the decoy COM survives intact, only real DHT goes
    trap_with_dht = plain[:2] + decoy + plain[2:]
    restripped = av._jpeg_strip_dht(trap_with_dht)
    assert decoy in restripped and not av._jpeg_has_dht(restripped)


def test_avi_fallback_fps_and_errors():
    import struct

    frames = _ramp_frames(2, 8, 8)
    data = bytearray(av.encode_avi_mjpeg(frames, fps=30))
    # zero out strh rate/scale -> falls back to avih us_per_frame
    i = bytes(data).index(b"strh")
    struct.pack_into("<II", data, i + 8 + 4 + 4 + 20, 0, 0)
    _, fps = av.decode_avi_mjpeg(bytes(data))
    assert fps == 30  # 1e6 // 33333 rounds back to 30
    with pytest.raises(ValueError, match="not an AVI"):
        av.decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    # a movi chunk that is not JPEG quarantines
    data2 = bytearray(av.encode_avi_mjpeg(frames, fps=10))
    j = bytes(data2).index(b"00dc")
    data2[j + 8 : j + 10] = b"XX"
    with pytest.raises(NotImplementedError, match="MJPEG only"):
        av.decode_avi_mjpeg(bytes(data2))


# ----------------------------------------------- spectral front-end


def test_spectral_pure_tone_lands_in_its_bin(spark):
    """A pure k=3 cosine must dominate bin 3 in every frame, with the
    low band carrying essentially all the power."""
    i = np.arange(av.SPEC_FRAME * 4)
    tone = np.floor(
        20000 * np.cos(2 * np.pi * 3 * i / av.SPEC_FRAME) + 0.5
    ).astype(np.int16)
    df = spark.createDataFrame(
        [("t", "wav", bytearray(av.encode_wav(tone)))],
        "id string, fmt string, content binary",
    )
    rows = av.spectral_features(df).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.error is None
        assert r.dom_bin == 3
        assert r.p_low > 100 * max(r.p_high, 1)


def test_spectral_tdiv_truncates_toward_zero():
    a = np.array([-130, -64, -1, 0, 1, 64, 130], dtype=np.int64)
    assert list(av._tdiv(a, 64)) == [-2, -1, 0, 0, 0, 1, 2]


def test_spectral_tail_dropped_and_quarantine(spark):
    tone = np.zeros(av.SPEC_FRAME + 10, dtype=np.int16)  # 1 frame + tail
    df = spark.createDataFrame(
        [
            ("ok", "wav", bytearray(av.encode_wav(tone))),
            ("bad", "wav", bytearray(b"not a wav")),
        ],
        "id string, fmt string, content binary",
    )
    rows = {r.id: r for r in av.spectral_features(df).collect()}
    assert rows["ok"].frame_idx == 0 and rows["ok"].error is None
    assert rows["bad"].error is not None and rows["bad"].dom_bin is None


def test_audio_fingerprint_planted_pairs_merge(spark):
    """The fixture renders doc_ids 6m+2 and 6m+5 from the same seed —
    their fingerprints MUST be equal; a different seed with a
    different frequency class must fingerprint apart."""
    import numpy as np

    def wav_for(seed: int) -> bytearray:
        n = seed % 500 + 100
        step = (seed % 8 + 1) * 1024
        i = np.arange(n, dtype=np.int64)
        samples = ((seed * 31 + i * step) % 65536 - 32768).astype(np.int16)
        return bytearray(av.encode_wav(samples))

    df = spark.createDataFrame(
        [
            ("8", "wav", wav_for(8)),     # 6*1+2
            ("11", "wav", wav_for(8)),    # 6*1+5 -> same seed 8
            ("14", "wav", wav_for(14)),   # other seed, other class
        ],
        "id string, fmt string, content binary",
    )
    fps = {r.id: r.fingerprint for r in av.audio_fingerprints(df).collect()}
    assert fps["8"] == fps["11"]
    assert fps["8"] != fps["14"]


def test_scene_changes_finds_exactly_the_planted_cut(spark):
    import numpy as np

    n, h, w = 6, 4, 4
    f = np.arange(n, dtype=np.int64)[:, None]
    i = np.arange(h * w * 3, dtype=np.int64)[None, :]
    px = ((7 + f * 17 + i * 3 + (f >= 3) * 128) % 256).astype(np.uint8)
    df = spark.createDataFrame(
        [
            ("v", bytearray(av.encode_rawvid(px.reshape(n, h, w, 3)))),
            ("bad", bytearray(b"nope")),
        ],
        "id string, content binary",
    )
    rows = av.scene_changes(df, energy_thresh=h * w * 3 * 8000).collect()
    good = sorted(
        (r for r in rows if r.id == "v"), key=lambda r: r.frame_idx
    )
    assert [r.frame_idx for r in good] == list(range(n - 1))
    assert [r.is_cut for r in good] == [False, False, True, False, False]
    bad = [r for r in rows if r.id == "bad"][0]
    assert bad.error is not None and bad.is_cut is None


def test_normalize_peak_scales_and_handles_silence(spark):
    import numpy as np

    quiet = (np.array([100, -200, 50], dtype=np.int16))
    silent = np.zeros(4, dtype=np.int16)
    df = spark.createDataFrame(
        [
            ("q", "wav", bytearray(av.encode_wav(quiet))),
            ("s", "wav", bytearray(av.encode_wav(silent))),
            ("bad", "wav", bytearray(b"x")),
        ],
        "id string, fmt string, content binary",
    )
    rows = {r.id: r for r in av.normalize_peak(df).collect()}
    q = rows["q"]
    assert q.peak_before == 200 and q.peak_after == 32767
    # y = trunc(x*32767/200): [16383, -32767, 8191]
    assert q.sample_sum == 16383 - 32767 + 8191
    s = rows["s"]
    assert s.peak_before == 0 and s.peak_after == 0 and s.sample_sum == 0
    assert rows["bad"].error is not None


# -------------------------------------------------- rational resample


def test_resample_linear_exact_values(spark):
    import numpy as np

    from dataset_batch_processor_spark.multimodal import av

    x = np.array([0, -4, 8], dtype=np.int16)
    df = spark.createDataFrame(
        [("a", "wav", bytearray(av.encode_wav(x, sample_rate=16_000)))],
        "id string, fmt string, content binary",
    )
    row = av.resample_linear(df, p=3, q=2).collect()[0]
    # n_out = ((3-1)*3)//2 + 1 = 4; positions t = i*2/3 of input:
    # i=0 -> x[0]=0; i=1 -> t=2: x[0] + tdiv((x[1]-x[0])*2, 3)
    #   = tdiv(-8,3) = -2 (toward zero, NOT floor's -3)
    # i=2 -> t=4: k=1, r=1: -4 + tdiv((8-(-4))*1, 3) = 0
    # i=3 -> t=6: k=2, r=0: x[2] = 8
    expect = [0, -2, 0, 8]
    assert row.error is None
    assert row.n_in == 3 and row.n_out == 4 and row.rate_out == 24_000
    assert row.out_sum == sum(expect)
    assert row.out_wsum == sum(v * (i + 1) for i, v in enumerate(expect))
