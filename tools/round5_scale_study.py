"""Amplified-corpus measurements for the round-5 operators.

Same recipe as the earlier studies (sf0.1 fixtures x deterministic
perturbed variants, local[32]); results fold into SCALE.md.

Usage: python tools/round5_scale_study.py [emb_factor] [doc_factor]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataset_batch_processor_spark.operators import ivfpq
from dataset_batch_processor_spark.session import get_spark
from tools.round2_scale_study import amplified_docs, amplified_emb, timed


def main() -> None:
    emb_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    doc_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark("round5_scale_study")

    # ---- IVF-PQ: one-pass index build (coarse assign + residual
    # encode), then the ADC query path against the persisted index
    emb = amplified_emb(spark, emb_factor).persist()
    n_emb = emb.count()
    # ~sqrt(n) coarse cells: mod 447 over the amplified id space gives
    # ~500 cells at 200k vectors (the production density guidance)
    ids, C = ivfpq.coarse_centroids(emb, centroid_mod=447)
    sub = ivfpq.sub_codebook_from_residuals(emb, ids, C)
    index = ivfpq.ivfpq_encode(emb, ids, C, sub).persist()
    rows, dt_build = timed(index.count)
    print(json.dumps({
        "exp": "ivfpq_index_build_exact_fold", "n_vectors": n_emb,
        "n_cells": len(ids), "index_rows": rows, "wall_s": dt_build,
    }))
    rows_g, dt_gemm = timed(
        lambda: ivfpq.ivfpq_encode(emb, ids, C, sub, exact_fold=False).count()
    )
    print(json.dumps({
        "exp": "ivfpq_index_build_gemm", "index_rows": rows_g,
        "wall_s": dt_gemm,
    }))

    queries = emb.filter(F.col("vec_id") % 997 == 0)
    n_q = queries.count()
    luts = ivfpq.ivfpq_query_luts(queries, ids, C, sub)
    topk, dt_q = timed(
        lambda: ivfpq.ivfpq_topk_from_index(index, luts).count()
    )
    print(json.dumps({
        "exp": "ivfpq_adc_query", "n_queries": n_q,
        "topk_rows": topk, "wall_s": dt_q,
    }))

    # ---- substring dedup spans over an amplified corpus
    try:
        from dataset_batch_processor_spark.operators import substring
    except ImportError:
        print(json.dumps({"exp": "substring_dup_spans",
                          "skipped": "module not built yet"}))
        return

    docs = amplified_docs(spark, doc_factor).select("doc_id", "text")
    n_docs = docs.count()
    spans, dt_s = timed(
        lambda: substring.substring_dup_spans_df(docs).count()
    )
    print(json.dumps({
        "exp": "substring_dup_spans_md5", "n_docs": n_docs,
        "span_rows": spans, "wall_s": dt_s,
    }))
    spans_x, dt_x = timed(
        lambda: substring.substring_dup_spans_df(
            docs, hash_fn="xxhash64"
        ).count()
    )
    print(json.dumps({
        "exp": "substring_dup_spans_xxhash64", "span_rows": spans_x,
        "wall_s": dt_x,
    }))


    # ---- SemDeDup over an amplified corpus with PLANTED semantic
    # dups (amplified_emb's per-rep perturbation makes every source
    # vector a family of near-identical copies). Production posture:
    # ~sqrt(n) clusters via centroid_mod, vectorized cosine kernel,
    # and the hash sub-split capping degenerate clusters (every copy
    # family lands in one cluster by construction — the worst case).
    from dataset_batch_processor_spark.operators import semdedup

    sd_emb = amplified_emb(spark, max(emb_factor // 5, 2)).persist()
    n_sd = sd_emb.count()
    surv_capped, dt_cap = timed(
        lambda: semdedup.semdedup_survivors(
            sd_emb, eps=0.95, centroid_mod=317, max_cluster_size=64,
            vectorized=True,
        ).count()
    )
    print(json.dumps({
        "exp": "semdedup_capped64", "n_vectors": n_sd,
        "survivors": surv_capped, "wall_s": dt_cap,
    }))
    sd_small = amplified_emb(spark, 5).persist()
    n_small = sd_small.count()
    surv_unc, dt_unc = timed(
        lambda: semdedup.semdedup_survivors(
            sd_small, eps=0.95, centroid_mod=97, vectorized=True
        ).count()
    )
    print(json.dumps({
        "exp": "semdedup_uncapped", "n_vectors": n_small,
        "survivors": surv_unc, "wall_s": dt_unc,
    }))


if __name__ == "__main__":
    main()
