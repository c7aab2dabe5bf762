"""k-center greedy: the distributed selection must reproduce an
independent single-process farthest-point reference (same
fixed-point lattice), and the coverage radii must be non-increasing
— the property that makes the radius sequence usable as a K chooser."""

from __future__ import annotations

import numpy as np

from dataset_batch_processor_spark.operators import coreset


def _ref_greedy(vecs: np.ndarray, ids: list[int], k: int):
    fx = np.floor(vecs * 1e6 + 0.5).astype(np.int64)
    order = np.argsort(ids)
    seed = order[0]
    sels = [(0, ids[seed], 0)]
    mind2 = ((fx - fx[seed]) ** 2).sum(axis=1)
    for rank in range(1, k):
        # argmax mind2, tie-break min id
        best = max(range(len(ids)), key=lambda j: (mind2[j], -ids[j]))
        sels.append((rank, ids[best], int(mind2[best])))
        d2 = ((fx - fx[best]) ** 2).sum(axis=1)
        mind2 = np.minimum(mind2, d2)
    return sels


def test_kcenter_matches_reference_and_radii_decrease(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    ids = list(range(40))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in ids],
        "vec_id long, embedding array<float>",
    )
    got = coreset.kcenter_greedy(emb, k=6)
    ref = _ref_greedy(vecs.astype(np.float64), ids, 6)
    assert got == ref
    radii = [d for _, _, d in got[1:]]
    assert radii == sorted(radii, reverse=True)
    # all selections distinct
    assert len({v for _, v, _ in got}) == 6
