"""Round-8 (late) amplification study: DSIR + boilerplate linearity.

SCALE.md claims the new pipeline families have no corpus-sized
shuffle — DSIR's exchanges are 4096 bucket rows plus one row per
document, and boilerplate extraction is narrow work plus a per-doc
reassembly agg. This study MEASURES that posture instead of
asserting it: the sf0.1 documents table is amplified K x (doc_id
re-keyed to stay unique, text unchanged) for K in {1, 4, 16, 64}
and each operator runs to a count() sink.

Expected shape if the posture holds: wall grows ~linearly in K
(scan-bound), and DSIR's weight table stays exactly <= 4096 rows at
every K. A super-linear knee would mean a hidden corpus-sized
shuffle or driver collect.

Usage: python tools/round8b_scale_study.py [sf_dir] [reps]
Prints a markdown table (folded into SCALE.md) + one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import boilerplate, dsir
from dataset_batch_processor_spark.session import get_spark


def amplified(docs, k: int):
    if k == 1:
        return docs
    return (
        docs.crossJoin(
            F.broadcast(
                docs.sparkSession.range(k).select(F.col("id").alias("_rep"))
            )
        )
        .withColumn("doc_id", F.col("doc_id") * k + F.col("_rep"))
        .drop("_rep")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("round8b-scale")
    docs = catalog.load_table(spark, sf_dir, "documents")

    out = []
    for k in (1, 4, 16, 64):
        amp = amplified(docs, k)
        n = amp.count()

        walls_d, walls_b = [], []
        wt_rows = None
        for _ in range(reps):
            t0 = time.monotonic()
            dsir.dsir_scores(amp).count()
            walls_d.append(time.monotonic() - t0)

            t0 = time.monotonic()
            pages = amp.select("doc_id", F.expr(boilerplate._PAGE).alias("html"))
            boilerplate.extract_main_text(pages, "html").count()
            walls_b.append(time.monotonic() - t0)
        wt_rows = dsir.dsir_bucket_weights(amp).count()

        walls_d.sort(), walls_b.sort()
        out.append(
            {
                "k": k,
                "rows": n,
                "dsir_s": round(walls_d[reps // 2], 3),
                "dsir_spread": [round(w, 3) for w in walls_d],
                "boiler_s": round(walls_b[reps // 2], 3),
                "boiler_spread": [round(w, 3) for w in walls_b],
                "weight_rows": wt_rows,
            }
        )
        print(
            f"| {k} | {n} | {out[-1]['dsir_s']} | {out[-1]['boiler_s']} "
            f"| {wt_rows} |",
            flush=True,
        )

    base = out[0]
    for r in out[1:]:
        r["dsir_x_per_k"] = round(r["dsir_s"] / base["dsir_s"] / r["k"], 3)
        r["boiler_x_per_k"] = round(
            r["boiler_s"] / base["boiler_s"] / r["k"], 3
        )
    print(json.dumps({"study": "round8b_amplification", "rows": out}))


if __name__ == "__main__":
    main()
