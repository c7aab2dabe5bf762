"""Product quantization (operators/pq.py).

The driver hash gate proves the SQL formulation against DuckDB; these
tests pin the production encode kernel to the SQL encode bit-for-bit
and sanity-check ADC geometry.
"""

from __future__ import annotations

import numpy as np

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import pq


def _sql_codes(spark, sf_dir):
    catalog.load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "embeddings"
    )
    # reuse the oracle CTE chain up to `codes`
    sql = pq.PQ_TOPK_SPARK.split("queries AS")[0].rstrip().rstrip(",")
    return spark.sql(sql + "\nSELECT vec_id, j, cid FROM codes")


def test_kernel_codes_match_sql_codes_exactly(spark, sf_dir):
    emb = catalog.load_table(spark, sf_dir, "embeddings")
    cents = pq.pq_centroids(emb)
    kern = {
        (r.vec_id, r.j): r.cid for r in pq.pq_encode(emb, cents).collect()
    }
    sql = {(r.vec_id, r.j): r.cid for r in _sql_codes(spark, sf_dir).collect()}
    assert kern == sql


def test_codes_shape_and_range(spark, sf_dir):
    emb = catalog.load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    codes = pq.pq_encode(emb, pq.pq_centroids(emb)).collect()
    assert len(codes) == n * pq.M
    assert all(0 <= r.cid < pq.K for r in codes)
    assert all(0 <= r.j < pq.M for r in codes)


def test_adc_distance_is_additive_lower_dimensional_exact(spark, sf_dir):
    """For a vector that IS a centroid, every sub-distance to itself
    is 0 -> its code must be its own cid in every subspace."""
    emb = catalog.load_table(spark, sf_dir, "embeddings")
    cents = pq.pq_centroids(emb)
    # the sampled centroid vec_ids, in order
    from pyspark.sql import functions as F

    sampled = [
        r.vec_id
        for r in emb.filter(F.col("vec_id") % pq.SAMPLE_MOD == 0)
        .select("vec_id").sort("vec_id").limit(pq.K).collect()
    ]
    codes = {
        (r.vec_id, r.j): r.cid
        for r in pq.pq_encode(emb, cents).collect()
        if r.vec_id in set(sampled)
    }
    for cid, vec_id in enumerate(sampled):
        for j in range(pq.M):
            assert codes[(vec_id, j)] == cid
