"""Amplified-corpus measurements for the round-5b operators
(imagedup dHash, PCA covariance GEMM, bigram-LM scoring).

Same recipe as the earlier studies (sf0.1 fixtures x deterministic
variants, local[32]); results fold into SCALE.md.

Usage: python tools/round5b_scale_study.py [img_factor] [emb_factor] [doc_factor]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataset_batch_processor_spark.operators import imagedup, lmscore, pca
from dataset_batch_processor_spark.session import get_spark
from tools.round2_scale_study import amplified_docs, amplified_emb, timed

SF = "/root/testdata/sf0.1"


def main() -> None:
    img_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    emb_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    doc_factor = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    spark = get_spark("round5b_scale_study")

    # ---- dHash, SQL lattice path: hash throughput at factor x 5000
    # images. doc_id = orig * factor + rep keeps the g-space mixing so
    # dup density stays realistic rather than factor-fold inflated.
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    reps = spark.range(img_factor).select(F.col("id").alias("rep"))
    amplified = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(reps))
        .select((F.col("doc_id") * img_factor + F.col("rep")).alias("doc_id"))
    )
    amplified.createOrReplaceTempView("documents")
    n_img = amplified.count()
    sql = (
        f"WITH {imagedup._hash_sql('spark')} "
        f"SELECT count(*) AS n FROM ({imagedup.HASHES_PIVOT})"
    )
    n_hashes, dt_hash = timed(lambda: spark.sql(sql).collect()[0].n)
    print(json.dumps({
        "exp": "dhash_sql_hashes", "n_images": n_img,
        "n_hashes": n_hashes, "wall_s": dt_hash,
        "imgs_per_s": round(n_img / dt_hash),
    }))

    # full pairs pipeline (banded candidates + Hamming verify) at the
    # same realistic density
    n_pairs, dt_pairs = timed(
        lambda: spark.sql(imagedup.DHASH_PAIRS_SPARK).count()
    )
    print(json.dumps({
        "exp": "dhash_sql_pairs", "n_images": n_img,
        "n_pairs": n_pairs, "wall_s": dt_pairs,
    }))

    # ---- dHash kernel path: real PNG encode -> decode -> signature
    from dataset_batch_processor_spark.multimodal import png  # noqa: F401

    kernel_ids = amplified.filter(F.col("doc_id") % 5 == 0).repartition(
        spark.sparkContext.defaultParallelism
    )
    n_k = kernel_ids.count()

    def gen(batches):
        import pandas as pd

        from dataset_batch_processor_spark.multimodal import png as p

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                arr = imagedup.lattice_image(d)
                out.append({
                    "id": str(d), "fmt": "png",
                    "content": p.encode_png(arr, filter_type=d % 5),
                })
            yield pd.DataFrame(out, columns=["id", "fmt", "content"])

    imgs = kernel_ids.mapInPandas(
        gen, schema="id string, fmt string, content binary"
    )
    n_sig, dt_kernel = timed(
        lambda: imagedup.dhash_bands(imgs)
        .filter(F.col("error").isNull()).count()
    )
    print(json.dumps({
        "exp": "dhash_kernel_png", "n_images": n_k, "n_sigs": n_sig,
        "wall_s": dt_kernel, "imgs_per_s": round(n_k / dt_kernel),
    }))

    # ---- PCA covariance: one-pass int64 GEMM at factor x 500 vectors;
    # output keyspace stays 2,080 rows regardless of n
    emb = amplified_emb(spark, emb_factor).persist()
    n_emb = emb.count()
    n_cov, dt_cov = timed(lambda: pca.covariance_stats(emb).count())
    print(json.dumps({
        "exp": "pca_covariance_gemm", "n_vectors": n_emb,
        "cov_rows": n_cov, "wall_s": dt_cov,
        "vecs_per_s": round(n_emb / dt_cov),
    }))
    emb.unpersist()

    # ---- bigram-LM scoring at factor x 5000 docs (train slice +
    # score joins all inside one SQL plan)
    docs_a = amplified_docs(spark, doc_factor).persist()
    n_docs = docs_a.count()
    docs_a.createOrReplaceTempView("documents")
    n_scored, dt_lm = timed(
        lambda: spark.sql(lmscore.BIGRAM_LM_SPARK).count()
    )
    print(json.dumps({
        "exp": "bigram_lm_score", "n_docs": n_docs,
        "n_scored": n_scored, "wall_s": dt_lm,
        "docs_per_s": round(n_docs / dt_lm),
    }))


if __name__ == "__main__":
    main()
