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


def test_wav_8bit_raises():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(b"\x00" * 50)
    with pytest.raises(NotImplementedError):
        av.decode_wav(buf.getvalue())
