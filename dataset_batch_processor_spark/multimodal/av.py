"""Audio/video binary-column plumbing.

Same design as images (multimodal/binary.py): opaque ``binary``
payloads + typed metadata, Arrow-batched mapInPandas kernels, codec
registry with real toy containers and documented stubs for the
formats whose libraries (ffmpeg/librosa/soundfile/decord) are not in
this container. The Spark-side contract — schemas, batch shapes,
partitioning — is real and tested either way.

REAL codec: ``wav`` (16-bit PCM via stdlib ``wave`` — decode+encode,
see decode_wav/encode_wav; oracled end-to-end by mm_wav_roundtrip).
Toy containers:
- ``rawpcm``:  b"PCM1" + sample_rate(u32) + n_samples(u32) + int16 mono
- ``rawvid``:  b"VID1" + n_frames(u32) + H(u32) + W(u32) + fps(u32)
               + frames as raw uint8 HxWx3, concatenated
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

PCM_MAGIC = b"PCM1"
VID_MAGIC = b"VID1"


def encode_rawpcm(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    assert samples.dtype == np.int16 and samples.ndim == 1
    return PCM_MAGIC + struct.pack(">II", sample_rate, len(samples)) + samples.tobytes()


def decode_rawpcm(content: bytes) -> tuple[np.ndarray, int]:
    if content[:4] != PCM_MAGIC:
        raise ValueError("not a rawpcm payload")
    rate, n = struct.unpack(">II", content[4:12])
    return np.frombuffer(content[12:], dtype=np.int16)[:n], rate


def encode_rawvid(frames: np.ndarray, fps: int = 10) -> bytes:
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    return VID_MAGIC + struct.pack(">IIII", n, h, w, fps) + frames.tobytes()


def decode_rawvid(content: bytes) -> tuple[np.ndarray, int]:
    if content[:4] != VID_MAGIC:
        raise ValueError("not a rawvid payload")
    n, h, w, fps = struct.unpack(">IIII", content[4:20])
    return (
        np.frombuffer(content[20:], dtype=np.uint8).reshape(n, h, w, 3),
        fps,
    )


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """REAL WAV codec — stdlib ``wave`` (RIFF/PCM), no soundfile
    needed. 16-bit PCM only; multi-channel downmixes to channel 0
    (deterministic, matches the mono feature contract)."""
    import io
    import wave as _wave

    with _wave.open(io.BytesIO(content), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"WAV: only 16-bit PCM supported (got {8 * w.getsampwidth()}-bit)"
            )
        nch = w.getnchannels()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    samples = np.frombuffer(raw, dtype="<i2")
    if nch > 1:
        samples = samples[::nch]  # channel 0
    return samples.copy(), rate


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono -> 16-bit PCM WAV bytes (stdlib ``wave``)."""
    import io
    import wave as _wave

    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav expects 1-D int16 samples")
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _missing(fmt: str, needs: str) -> Callable[[bytes], tuple]:
    def decode(_content: bytes) -> tuple:
        raise NotImplementedError(
            f"codec '{fmt}' requires {needs}, not present in this container; "
            "register via register_audio_codec()/register_video_codec()"
        )

    return decode


AUDIO_CODECS: dict[str, Callable[[bytes], tuple[np.ndarray, int]]] = {
    "rawpcm": decode_rawpcm,
    "wav": decode_wav,  # REAL (stdlib wave)
    **{f: _missing(f, "soundfile/librosa") for f in ("mp3", "flac", "ogg")},
}

VIDEO_CODECS: dict[str, Callable[[bytes], tuple[np.ndarray, int]]] = {
    "rawvid": decode_rawvid,
    **{f: _missing(f, "ffmpeg/decord") for f in ("mp4", "webm", "mkv", "avi")},
}


def register_audio_codec(fmt: str, dec: Callable) -> None:
    AUDIO_CODECS[fmt.lower()] = dec


def register_video_codec(fmt: str, dec: Callable) -> None:
    VIDEO_CODECS[fmt.lower()] = dec


# ---------------------------------------------------------- audio features

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", IntegerType()),
        StructField("error", StringType()),
    ]
)


def audio_features(df: DataFrame) -> DataFrame:
    """Decode + summary features (duration, RMS, peak) — the audio
    analogue of image header metadata. Errors quarantined (F7)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                rec = {"id": str(row.id), "sample_rate": None, "n_samples": None,
                       "duration_s": None, "rms": None, "peak": None, "error": None}
                try:
                    samples, rate = AUDIO_CODECS[row.fmt.lower()](bytes(row.content))
                    x = samples.astype(np.float64)
                    rec.update(
                        sample_rate=int(rate),
                        n_samples=int(len(samples)),
                        duration_s=float(len(samples) / rate),
                        rms=float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
                        # abs in the WIDE dtype: np.abs(int16 -32768)
                        # wraps back to -32768, under-reporting the
                        # peak of full-scale negative samples
                        peak=int(np.max(np.abs(samples.astype(np.int64))))
                        if len(samples) else 0,
                    )
                except Exception as e:
                    rec["error"] = f"{type(e).__name__}: {e}"
                out.append(rec)
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return df.select("id", "fmt", "content").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


# ----------------------------------------------------------- frame sampling

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_s", DoubleType()),
        StructField("content", BinaryType()),  # rawrgb-encoded frame
        StructField("error", StringType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 5) -> DataFrame:
    """1 video row → K sampled frame rows (a flat map, like tiling):
    every ``every_n``-th frame re-encoded as a rawrgb image payload so
    the image pipeline (tiling, dedup, embedding) applies downstream.

    Skew note: one long video fans out to many frames; callers
    repartition by (id, frame_idx) before heavy per-frame work —
    identical mitigation to tile materialization.
    """
    from .binary import encode_rawrgb

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    frames, fps = VIDEO_CODECS[row.fmt.lower()](bytes(row.content))
                    for idx in range(0, frames.shape[0], every_n):
                        out.append(
                            {"id": str(row.id), "frame_idx": idx,
                             "ts_s": float(idx / fps),
                             "content": encode_rawrgb(
                                 np.ascontiguousarray(frames[idx])
                             ),
                             "error": None}
                        )
                except Exception as e:
                    out.append(
                        {"id": str(row.id), "frame_idx": None, "ts_s": None,
                         "content": None, "error": f"{type(e).__name__}: {e}"}
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields]
            )

    return df.select("id", "fmt", "content").mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA
    )


# ------------------------------------------------------- VAD segmentation

VAD_FRAME = 64  # samples per analysis frame


def vad_segments(df: DataFrame, frame: int = VAD_FRAME,
                 energy_thresh: int = 22_900_000_000) -> DataFrame:
    """Energy-threshold voice-activity segmentation: 1 audio row -> K
    segment rows (maximal runs of consecutive active frames) — the
    ASR-training-data prep step that splits long recordings into
    utterance-sized pieces.

    Frame energy is the EXACT int64 sum of squared samples (int16
    squares fit 2^30; 64 of them fit 2^36), so the active flags — and
    therefore the segmentation — are integer-deterministic and the
    driver's hash gate applies (mm_audio_vad_segments). The trailing
    sub-frame tail is dropped, matching the SQL oracle. Decode
    failures quarantine (F7)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    samples, rate = AUDIO_CODECS[row.fmt.lower()](
                        bytes(row.content)
                    )
                    n_frames = len(samples) // frame
                    x = samples[: n_frames * frame].astype(np.int64)
                    energy = (x * x).reshape(n_frames, frame).sum(axis=1)
                    active = energy > energy_thresh
                    # islands: segment id = cumsum of run starts
                    starts = np.diff(
                        np.concatenate(([0], active.view(np.int8)))
                    ) == 1
                    seg_of = np.cumsum(starts) - 1
                    for seg in range(seg_of[active].max() + 1 if active.any() else 0):
                        idx = np.nonzero(active & (seg_of == seg))[0]
                        out.append(
                            {
                                "id": str(row.id),
                                "seg_idx": int(seg),
                                "start_frame": int(idx[0]),
                                "end_frame": int(idx[-1]),
                                "n_frames": int(len(idx)),
                                "start_s": float(idx[0] * frame / rate),
                                "error": None,
                            }
                        )
                except Exception as e:  # noqa: BLE001 — quarantine
                    out.append(
                        {"id": str(row.id), "seg_idx": None,
                         "start_frame": None, "end_frame": None,
                         "n_frames": None, "start_s": None,
                         "error": f"{type(e).__name__}: {e}"}
                    )
            yield pd.DataFrame(
                out,
                columns=["id", "seg_idx", "start_frame", "end_frame",
                         "n_frames", "start_s", "error"],
            )

    return df.select("id", "fmt", "content").mapInPandas(
        run,
        schema=("id string, seg_idx int, start_frame int, end_frame int, "
                "n_frames int, start_s double, error string"),
    )
