"""Feature hashing: the dense embed_df form must agree with the
unpivoted oracle query, and the output must feed the embedding
operators."""

from __future__ import annotations

import numpy as np

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import feathash


def test_dense_matches_unpivoted(spark, sf_dir):
    docs = catalog.load_table(spark, sf_dir, "documents")
    dense = {
        r.doc_id: np.array(r.embedding)
        for r in feathash.embed_df(docs).collect()
    }
    sparse = {}
    for r in feathash.QUERIES["docs_feature_hash_embedding"](
        spark, sf_dir
    ).collect():
        sparse.setdefault(r.doc_id, np.zeros(feathash.FH_DIM))[
            r.dim
        ] = r.weight
    assert set(dense) == set(sparse)
    for did in dense:
        np.testing.assert_array_equal(dense[did], sparse[did])


def test_feeds_embedding_operators(spark, sf_dir):
    """The dense output slots straight into the cosine machinery."""
    from dataset_batch_processor_spark.functions import vector

    from pyspark.sql import functions as F

    docs = catalog.load_table(spark, sf_dir, "documents")
    emb = feathash.embed_df(docs).limit(20)
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = (
        a.crossJoin(b)
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.round(
                vector.cosine(F.col("a.embedding"), F.col("b.embedding")), 6
            ).alias("cos")
        )
    )
    vals = [r.cos for r in pairs.collect() if r.cos is not None]
    assert vals and all(-1.0 <= v <= 1.0 for v in vals)
