"""IVF-PQ (operators/ivfpq.py).

The driver hash gate proves the SQL formulation against DuckDB; these
tests pin the production build kernel to the SQL bit-for-bit and
check the residual geometry the composition exists for.
"""

from __future__ import annotations

import numpy as np

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import ivfpq


def _sql_index(spark, sf_dir):
    catalog.load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "embeddings"
    )
    sql = ivfpq.IVFPQ_TOPK_SPARK.split("queries AS")[0].rstrip().rstrip(",")
    return spark.sql(
        sql + "\nSELECT a.vec_id, a.c_id, v.j, v.cid "
        "FROM assign a JOIN codes v ON v.vec_id = a.vec_id"
    )


def test_kernel_index_matches_sql_exactly(spark, sf_dir):
    emb = catalog.load_table(spark, sf_dir, "embeddings")
    ids, C = ivfpq.coarse_centroids(emb)
    sub = ivfpq.sub_codebook_from_residuals(emb, ids, C)
    kern = {
        (r.vec_id, r.j): (r.c_id, r.cid)
        for r in ivfpq.ivfpq_encode(emb, ids, C, sub).collect()
    }
    sql = {
        (r.vec_id, r.j): (r.c_id, r.cid)
        for r in _sql_index(spark, sf_dir).collect()
    }
    assert kern == sql


def test_sampled_vectors_self_code_exactly(spark, sf_dir):
    """A vector whose residual IS a sub-codebook entry must encode to
    that entry in every subspace (sub-distance 0 beats everything,
    lowest-cid tie-break) — the IVF-PQ analogue of test_pq's
    centroid-self-code invariant, proving the residual path is wired
    through the encoder, not the raw vectors.

    Note the residual-MSE-beats-raw-PQ property deliberately is NOT
    asserted here: it needs clustered data (real embeddings), and the
    synthetic fixture vectors are near-uniform, where coarse residuals
    can carry MORE variance than the raw vectors. Recall quality on
    clustered data is the recall report's job."""
    from pyspark.sql import functions as F

    emb = catalog.load_table(spark, sf_dir, "embeddings")
    ids, C = ivfpq.coarse_centroids(emb)
    sub = ivfpq.sub_codebook_from_residuals(emb, ids, C)
    sampled = [
        r.vec_id
        for r in emb.filter(
            F.col("vec_id") % ivfpq.SUB_SAMPLE_MOD == ivfpq.SUB_SAMPLE_REM
        ).select("vec_id").sort("vec_id").limit(ivfpq.K).collect()
    ]
    codes = {
        (r.vec_id, r.j): r.cid
        for r in ivfpq.ivfpq_encode(emb, ids, C, sub).collect()
        if r.vec_id in set(sampled)
    }
    for cid, vec_id in enumerate(sampled):
        for j in range(ivfpq.M):
            assert codes[(vec_id, j)] == cid


def test_index_query_path_matches_sql_topk_exactly(spark, sf_dir):
    """Production path (persisted index + distributed LUTs + ADC join)
    must reproduce the oracle SQL's top-k bit-for-bit — integer
    distances make this an exact equality, not a tolerance check."""
    from pyspark.sql import functions as F

    emb = catalog.load_table(spark, sf_dir, "embeddings")
    ids, C = ivfpq.coarse_centroids(emb)
    sub = ivfpq.sub_codebook_from_residuals(emb, ids, C)
    index = ivfpq.ivfpq_encode(emb, ids, C, sub)
    queries = emb.filter(F.col("vec_id") % ivfpq.QUERY_MOD == 0)
    luts = ivfpq.ivfpq_query_luts(queries, ids, C, sub)
    kern = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_dist)
        for r in ivfpq.ivfpq_topk_from_index(index, luts).collect()
    }
    emb.createOrReplaceTempView("embeddings")
    sql = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_dist)
        for r in spark.sql(ivfpq.IVFPQ_TOPK_SPARK).collect()
    }
    assert kern == sql


def test_codes_cover_all_vectors_once(spark, sf_dir):
    emb = catalog.load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    ids, C = ivfpq.coarse_centroids(emb)
    sub = ivfpq.sub_codebook_from_residuals(emb, ids, C)
    enc = ivfpq.ivfpq_encode(emb, ids, C, sub).collect()
    assert len(enc) == n * ivfpq.M
    assert all(0 <= r.cid < ivfpq.K for r in enc)
    assert set(r.c_id for r in enc) <= set(ids.tolist())
