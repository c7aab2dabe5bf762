"""Amplified-corpus measurements for the round-4 operators.

Same recipe as the round-1/2 studies (sf0.1 fixtures x deterministic
perturbed variants, local[32]); results fold into SCALE.md.

Usage: python tools/round4_scale_study.py [doc_factor] [emb_factor]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataset_batch_processor_spark.operators import pq
from dataset_batch_processor_spark.operators.dedup import (
    containment_verify_df,
    lsh_pairs_df,
)
from dataset_batch_processor_spark.session import get_spark
from dataset_batch_processor_spark.streaming import incremental
from tools.round2_scale_study import amplified_docs, amplified_emb, timed

SF = "/root/testdata/sf0.1"


def main() -> None:
    doc_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    emb_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    spark = get_spark("round4_scale_study")

    # ---- PQ encode at emb_factor x 5k vectors
    emb = amplified_emb(spark, emb_factor).persist()
    n_emb = emb.count()
    cents = pq.pq_centroids(emb)
    codes, dt = timed(
        lambda: pq.pq_encode(emb, cents).count()
    )
    print(json.dumps({"exp": "pq_encode", "n_vectors": n_emb,
                      "code_rows": codes, "wall_s": dt}))

    # ---- incremental LSH over an amplified corpus, 4 micro-batches,
    # vs the batch pipeline on the same corpus
    docs = amplified_docs(spark, doc_factor).select("doc_id", "text")
    stage = tempfile.mkdtemp(prefix="dbp_r4_inc_stage_")
    for part in range(4):
        docs.filter(F.col("doc_id") % 4 == part).write.mode("append").parquet(
            stage
        )
    work = tempfile.mkdtemp(prefix="dbp_r4_inc_work_")
    inc_pairs, dt_inc = timed(
        lambda: incremental.run_incremental_over_dir(
            spark, stage, work, max_files_per_trigger=8
        ).count()
    )
    print(json.dumps({"exp": "incremental_lsh_4batches",
                      "n_docs": docs.count(), "pairs": inc_pairs,
                      "wall_s": dt_inc}))
    batch_pairs, dt_batch = timed(lambda: lsh_pairs_df(docs).count())
    print(json.dumps({"exp": "batch_lsh_same_corpus",
                      "pairs": batch_pairs, "wall_s": dt_batch,
                      "match": batch_pairs == inc_pairs}))

    # ---- containment verify over a capped candidate set (the
    # amplified corpus is dup-saturated; verification cost is linear
    # in candidates, so measure rate on a 2M-pair slice)
    sub = docs.filter(F.col("doc_id") % 20 == 0)
    cand, dt_c = timed(
        lambda: containment_verify_df(sub).count()
    )
    print(json.dumps({"exp": "containment_verify",
                      "n_docs": sub.count(), "pairs_verified": cand,
                      "wall_s": dt_c}))


if __name__ == "__main__":
    main()
