"""Amplified-corpus measurements for the round-2 operators.

Same recipe as SCALE.md's round-1 studies: sf0.1 fixtures amplified
with deterministic perturbations, local[32]. Prints one JSON line per
experiment; results are folded into SCALE.md.

Usage: python tools/round2_scale_study.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from dataset_batch_processor_spark.operators import (
    components,
    dedup,
    similarity,
    textclean,
)
from dataset_batch_processor_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def amplified_docs(spark, factor: int):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        # vary a suffix so variants are near- but not exact dups
        F.concat("text", F.lit(" v"), F.col("rep").cast("string")).alias("text"),
        "lang",
        "n_chars",
    )


def amplified_emb(spark, factor: int):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: x + (F.col("rep") % 7).cast("float") * F.lit(0.013),
        ).alias("embedding"),
    )


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 1)


def main():
    spark = get_spark("round2_scale")

    # 1) text cleaning throughput on 100k docs (JVM regex chain)
    docs = amplified_docs(spark, 20).persist()
    n_docs = docs.count()
    docs.createOrReplaceTempView("documents")
    _, t_clean = timed(
        lambda: textclean._q_clean_pii(spark, SF).count()  # uses catalog
    )
    print(json.dumps({"exp": "textclean", "n_docs": 5000,
                      "wall_s": t_clean,
                      "note": "catalog path, sf0.1 base"}))
    cleaned = docs.select(
        "doc_id", textclean.clean_text(F.col("text")).alias("c")
    )
    _, t_clean_amp = timed(lambda: cleaned.agg(F.sum(F.length("c"))).collect())
    print(json.dumps({"exp": "textclean_amplified", "n_docs": n_docs,
                      "wall_s": t_clean_amp,
                      "docs_per_s": int(n_docs / t_clean_amp)}))

    # 2) dup-cluster components over the amplified near-dup graph
    pairs = dedup.lsh_pairs_df(docs).persist()
    n_pairs, t_pairs = timed(pairs.count)
    cc, t_cc = timed(
        lambda: components.connected_components(
            pairs, src="doc_a", dst="doc_b"
        ).persist()
    )
    n_nodes = cc.count()
    n_comps = cc.select("comp").distinct().count()
    print(json.dumps({"exp": "components", "n_docs": n_docs,
                      "n_candidate_pairs": n_pairs, "pairs_wall_s": t_pairs,
                      "n_nodes": n_nodes, "n_components": n_comps,
                      "cc_wall_s": t_cc}))
    docs.unpersist(); pairs.unpersist()

    # 3) trained IVF at 200k vectors: build vs probe split
    emb = amplified_emb(spark, 100).persist()
    n_vec = emb.count()
    (ids, Cn), t_train = timed(lambda: similarity.ivf_train_centroids(emb))
    assign, t_assign = timed(
        lambda: similarity.ivf_assign_trained(emb, ids, Cn)
        .select("vec_id", "centroid_id").persist()
    )
    assign.count()
    topk, t_probe = timed(
        lambda: similarity.ivf_topk_trained(
            emb, ids, Cn, n_probe=4, assign=assign
        ).count()
    )
    print(json.dumps({"exp": "ivf_trained", "n_vectors": n_vec,
                      "n_centroids": int(len(ids)),
                      "train_wall_s": t_train, "assign_wall_s": t_assign,
                      "probe_wall_s": t_probe, "topk_rows": topk}))


if __name__ == "__main__":
    main()
