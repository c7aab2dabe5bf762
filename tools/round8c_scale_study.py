"""Round-8 (late) kernel-throughput study: audio/video mapInPandas.

The spectral front-end, fingerprints, and scene-cut detection are
Arrow-batched numpy kernels; their 100-TB posture is "perfectly
parallel, throughput scales with cores x clips". This study measures
clips/second as the clip count grows (K x the sf0.1 audio-fixture
count) — a flat or rising rate confirms there is no hidden
serialization (driver loop, skewed partition, per-row Python).

Usage: python tools/round8c_scale_study.py [reps]
Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dataset_batch_processor_spark.multimodal import av
from dataset_batch_processor_spark.session import get_spark

BASE = 1667  # ~the sf0.1 audio-slice clip count


def _wav_clips(spark, n):
    ids = spark.range(n).select(F.col("id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf["id"]:
                d = int(d)
                m = d % 500 + 100
                i = np.arange(m, dtype=np.int64)
                s = ((d * 31 + i * 7) % 65536 - 32768).astype(np.int16)
                out.append({"id": str(d), "fmt": "wav",
                            "content": av.encode_wav(s)})
            yield pd.DataFrame(out, columns=["id", "fmt", "content"])

    return ids.repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(gen, schema="id string, fmt string, content binary")


def _vid_clips(spark, n):
    ids = spark.range(n).select(F.col("id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf["id"]:
                d = int(d)
                m = d % 9 + 4
                f = np.arange(m, dtype=np.int64)[:, None]
                i = np.arange(6 * 8 * 3, dtype=np.int64)[None, :]
                px = ((d * 13 + f * 17 + i * 3) % 256).astype(np.uint8)
                out.append({"id": str(d),
                            "content": av.encode_rawvid(
                                px.reshape(m, 6, 8, 3))})
            yield pd.DataFrame(out, columns=["id", "content"])

    return ids.repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(gen, schema="id string, content binary")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("round8c-kernels")
    out = []
    for k in (1, 4, 16):
        n = BASE * k
        ws, vs = [], []
        for _ in range(reps):
            t0 = time.monotonic()
            av.spectral_features(_wav_clips(spark, n)).count()
            ws.append(time.monotonic() - t0)
            t0 = time.monotonic()
            av.scene_changes(
                _vid_clips(spark, n), energy_thresh=6 * 8 * 3 * 8000
            ).count()
            vs.append(time.monotonic() - t0)
        ws.sort(), vs.sort()
        row = {
            "k": k,
            "clips": n,
            "spectral_s": round(ws[reps // 2], 3),
            "spectral_clips_per_s": round(n / ws[reps // 2]),
            "scene_s": round(vs[reps // 2], 3),
            "scene_clips_per_s": round(n / vs[reps // 2]),
        }
        out.append(row)
        print(
            f"| {k} | {n} | {row['spectral_s']} "
            f"| {row['spectral_clips_per_s']} | {row['scene_s']} "
            f"| {row['scene_clips_per_s']} |",
            flush=True,
        )
    print(json.dumps({"study": "round8c_kernel_throughput", "rows": out}))


if __name__ == "__main__":
    main()
