"""PCA: driver-side fit from the distributed fixed-point covariance,
broadcast projection kernel."""

from __future__ import annotations

import numpy as np

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import pca


def _fit(spark, sf_dir, k=8):
    emb = catalog.load_table(spark, sf_dir, "embeddings")
    rows = [r.asDict() for r in pca.covariance_stats(emb).collect()]
    return pca.fit_loadings(rows, k), emb


def test_loadings_orthonormal_and_match_numpy(spark, sf_dir):
    load, emb = _fit(spark, sf_dir, k=8)
    assert load.shape == (8, pca.DIM)
    np.testing.assert_allclose(load @ load.T, np.eye(8), atol=1e-9)

    # same answer as numpy PCA on the locally collected matrix (up to
    # the fixed-point quantization of the covariance)
    x = np.stack([r.embedding for r in emb.select("embedding").collect()])
    x = x.astype(np.float64)
    c = np.cov(x, rowvar=False)
    w, v = np.linalg.eigh(c)
    ref = v[:, np.argsort(w)[::-1][:8]].T
    for row in ref:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1
    # compare spanned subspace via projector (basis-sign agnostic)
    np.testing.assert_allclose(load.T @ load, ref.T @ ref, atol=1e-2)


def test_projection_kernel_matches_numpy(spark, sf_dir):
    load, emb = _fit(spark, sf_dir, k=4)
    got = {
        r.vec_id: np.array(r.projected)
        for r in pca.pca_project(emb, load).collect()
    }
    x = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    assert set(got) == set(x)
    for vid, e in x.items():
        np.testing.assert_allclose(got[vid], load @ e, atol=1e-12)


def test_projected_variance_descends(spark, sf_dir):
    load, emb = _fit(spark, sf_dir, k=6)
    proj = np.stack(
        [r.projected for r in pca.pca_project(emb, load).collect()]
    )
    var = proj.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(len(var) - 1))
