"""Streaming pass@k scoreboard: arrival-order invariance, idempotent
retry commits, batch parity, and the histogram-exactness law the
merge relies on."""

from __future__ import annotations

import os

from math import comb

from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import rlvr
from dataset_batch_processor_spark.streaming import rlvrgate

SF = "/root/testdata/sf0.001"


def _passk_from_partials(spark, docs, splits, commits_dir):
    for batch_id, pred in enumerate(splits):
        out = os.path.join(commits_dir, f"batch_id={batch_id}")
        rlvrgate.grade_partial(docs.filter(pred)).write.mode(
            "overwrite"
        ).parquet(out)
    return {
        r["k"]: (r["n_tasks"], r["pass_at_k_ppm"])
        for r in rlvrgate.read_passk(spark, commits_dir).collect()
    }


def test_arrival_order_invariant_and_batch_parity(spark, tmp_path):
    docs = catalog.load_table(spark, SF, "documents").select(
        "doc_id", "text"
    )
    a = _passk_from_partials(
        spark, docs,
        [F.col("doc_id") % 3 == i for i in (0, 1, 2)],
        str(tmp_path / "ca"),
    )
    b = _passk_from_partials(
        spark, docs,
        [F.col("doc_id") % 3 == i for i in (2, 0, 1)],
        str(tmp_path / "cb"),
    )
    assert a == b
    # batch parity: drained stream == the one-pass batch query
    docs.createOrReplaceTempView("documents")
    batch = {
        r["k"]: (r["n_tasks"], r["pass_at_k_ppm"])
        for r in spark.sql(rlvr.PASSK_SPARK).collect()
    }
    assert a == batch


def test_retried_batch_replaces_its_partition(spark, tmp_path):
    docs = catalog.load_table(spark, SF, "documents").select(
        "doc_id", "text"
    )
    commits = str(tmp_path / "cr")
    once = _passk_from_partials(
        spark, docs,
        [F.col("doc_id") % 2 == i for i in (0, 1)],
        commits,
    )
    # "retry" batch 1: same data committed again to the same partition
    out = os.path.join(commits, "batch_id=1")
    rlvrgate.grade_partial(docs.filter(F.col("doc_id") % 2 == 1)).write.mode(
        "overwrite"
    ).parquet(out)
    again = {
        r["k"]: (r["n_tasks"], r["pass_at_k_ppm"])
        for r in rlvrgate.read_passk(spark, commits).collect()
    }
    assert once == again


def test_histogram_recompute_is_exact():
    """The merge law: sum_c cnt_c * task_ppm(c) // n equals the
    per-task mean because task_ppm depends only on c — verified for
    every c distribution shape over a small domain."""
    n = rlvr.N_ROLLOUTS

    def ppm(c, k):
        return 1_000_000 - comb(n - c, k) * 1_000_000 // comb(n, k)

    hists = [
        {0: 5, 3: 2, 8: 1},
        {1: 1},
        {c: c + 1 for c in range(n + 1)},
    ]
    for h in hists:
        tasks = [c for c, cnt in h.items() for _ in range(cnt)]
        for k in rlvr.PASS_KS:
            per_task = sum(ppm(c, k) for c in tasks) // len(tasks)
            from_hist = sum(
                ppm(c, k) * cnt for c, cnt in h.items()
            ) // sum(h.values())
            assert per_task == from_hist
