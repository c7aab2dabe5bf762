"""Round-8 (final stretch) kernel-throughput study: image patchify,
augmentation views, rational audio resample.

Same protocol as round8c: the three new mapInPandas kernels are
Arrow-batched numpy with no shuffle; measuring clips-or-images/sec
at 1x/4x/16x the fixture-scale count confirms the flat-wall /
rising-throughput posture (no driver loop, no skew, no per-row
Python).

Usage: python tools/round8d_scale_study.py [reps]
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

from dataset_batch_processor_spark.multimodal import av, binary, png
from dataset_batch_processor_spark.session import get_spark

BASE = 1667


def _ids(spark, n):
    return spark.range(n).repartition(
        spark.sparkContext.defaultParallelism
    )


def _patchify_count(spark, n) -> int:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf["id"]:
                d = int(d)
                w, h = (d % 4 + 1) * 8, (d % 3 + 1) * 8
                y, x, c = np.mgrid[0:h, 0:w, 0:3]
                arr = ((d + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)
                dec = binary.decode_any("png", png.encode_png(arr))
                g = binary.patchify_rgb(dec, 8)
                out.append({"id": d, "n": int(g.shape[0] * g.shape[1])})
            yield pd.DataFrame(out, columns=["id", "n"])

    return _ids(spark, n).mapInPandas(run, schema="id long, n int").count()


def _augment_count(spark, n) -> int:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf["id"]:
                d = int(d)
                w, h = (d % 4 + 1) * 8, (d % 3 + 1) * 8
                y, x, c = np.mgrid[0:h, 0:w, 0:3]
                arr = ((d + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)
                dec = binary.decode_any("png", png.encode_png(arr))
                s = 0
                for v in binary.augment_views(dec).values():
                    s += int(v.astype(np.int64).sum())
                out.append({"id": d, "s": s})
            yield pd.DataFrame(out, columns=["id", "s"])

    return _ids(spark, n).mapInPandas(run, schema="id long, s long").count()


def _wav_clips(spark, n):
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

    return _ids(spark, n).mapInPandas(
        gen, schema="id string, fmt string, content binary"
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("round8d-kernels")
    out = []
    print("| k | items | patchify_s | img/s | augment_s | img/s "
          "| resample_s | clips/s |")
    print("|---|---|---|---|---|---|---|---|")
    for k in (1, 4, 16):
        n = BASE * k
        ps, gs, rs = [], [], []
        for _ in range(reps):
            t0 = time.monotonic()
            _patchify_count(spark, n)
            ps.append(time.monotonic() - t0)
            t0 = time.monotonic()
            _augment_count(spark, n)
            gs.append(time.monotonic() - t0)
            t0 = time.monotonic()
            av.resample_linear(_wav_clips(spark, n), p=3, q=2).count()
            rs.append(time.monotonic() - t0)
        ps.sort(), gs.sort(), rs.sort()
        row = {
            "k": k,
            "items": n,
            "patchify_s": round(ps[reps // 2], 3),
            "patchify_per_s": round(n / ps[reps // 2]),
            "augment_s": round(gs[reps // 2], 3),
            "augment_per_s": round(n / gs[reps // 2]),
            "resample_s": round(rs[reps // 2], 3),
            "resample_per_s": round(n / rs[reps // 2]),
        }
        out.append(row)
        print(
            f"| {k} | {n} | {row['patchify_s']} | {row['patchify_per_s']} "
            f"| {row['augment_s']} | {row['augment_per_s']} "
            f"| {row['resample_s']} | {row['resample_per_s']} |",
            flush=True,
        )
    print(json.dumps({"study": "round8d_kernel_throughput", "rows": out}))


if __name__ == "__main__":
    main()
