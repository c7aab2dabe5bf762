"""Pocket-perceptron distillation (operators/perceptron.py).

Pins: (1) the distributed trajectory equals an independent numpy
replay (same features, trunc division) on the sf fixture; (2)
trunc_div matches Spark DIV / DuckDB // on negatives (Python //
floors — the exact drift the house rule warns about); (3) pocket
selection semantics; (4) the pocket never trains worse than epoch 1
(monotone-in-quality guarantee the gate relies on).
"""
from __future__ import annotations

import numpy as np

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators.perceptron import (
    P_DIMS,
    P_EPOCHS,
    STEP_SCALE,
    features_df,
    pocket_epoch,
    train_trajectory,
    trunc_div,
)


def test_trunc_div_matches_engine_semantics():
    # Spark DIV and DuckDB // truncate toward zero; Python // floors.
    assert trunc_div(7, 2) == 3
    assert trunc_div(-7, 2) == -3      # Python -7 // 2 == -4
    assert trunc_div(7, -2) == -3
    assert trunc_div(-7, -2) == 3
    assert trunc_div(0, 5) == 0


def test_trajectory_matches_numpy_replay(spark, sf_dir):
    feats = features_df(
        catalog.load_table(spark, sf_dir, "documents")
    ).collect()
    X = np.array(
        [[r[f"f{d}"] for d in range(P_DIMS)] for r in feats if r["is_train"]],
        dtype=np.int64,
    )
    y = np.array([r["y"] for r in feats if r["is_train"]], dtype=np.int64)

    w = np.zeros(P_DIMS, dtype=np.int64)
    expect = []
    mis = (y * (X @ w)) <= 0
    nerr, delta = int(mis.sum()), (y[mis, None] * X[mis]).sum(0)
    for e in range(1, P_EPOCHS + 1):
        if nerr > 0:
            w = w + np.array(
                [trunc_div(STEP_SCALE * int(d), nerr * e) for d in delta],
                dtype=np.int64,
            )
        mis = (y * (X @ w)) <= 0
        nerr, delta = int(mis.sum()), (y[mis, None] * X[mis]).sum(0)
        expect.append((list(w), nerr))

    _, traj = train_trajectory(spark, sf_dir)
    assert [(list(map(int, w_)), n) for w_, n in traj] == [
        ([int(v) for v in w_], n) for w_, n in expect
    ]


def test_pocket_prefers_fewest_errors_then_earliest():
    traj = [([1], 30), ([2], 10), ([3], 10), ([4], 20)]
    assert pocket_epoch(traj) == 2
    traj = [([1], 5), ([2], 10), ([3], 5)]
    assert pocket_epoch(traj) == 1


def test_pocket_no_worse_than_first_epoch(spark, sf_dir):
    _, traj = train_trajectory(spark, sf_dir)
    pe = pocket_epoch(traj)
    assert traj[pe - 1][1] <= traj[0][1]
