"""Streaming canary-exposure twin: disjoint-shard merge exactness,
idempotent retry, and batch parity against the gated leak card."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import canary
from dataset_batch_processor_spark.streaming import canarygate

SF = "/root/testdata/sf0.001"


def _card_from_partials(spark, docs, splits, commits_dir):
    for batch_id, pred in enumerate(splits):
        out = os.path.join(commits_dir, f"batch_id={batch_id}")
        canarygate.exposure_partial(docs.filter(pred)).write.mode(
            "overwrite"
        ).parquet(out)
    r = canarygate.read_leak_card(spark, commits_dir).collect()[0]
    return (r.n_planted, r.n_docs_leaked, r.n_leak_rollouts,
            r.exposure_ppm)


def test_order_invariance_retry_and_batch_parity(spark, tmp_path):
    docs = catalog.load_table(spark, SF, "documents").select(
        "doc_id", "text"
    )
    a = _card_from_partials(
        spark, docs,
        [F.col("doc_id") % 3 == i for i in (0, 1, 2)],
        str(tmp_path / "ca"),
    )
    b = _card_from_partials(
        spark, docs,
        [F.col("doc_id") % 3 == i for i in (2, 0, 1)],
        str(tmp_path / "cb"),
    )
    assert a == b
    # retry: re-commit batch 1 into its own partition — unchanged
    out = os.path.join(str(tmp_path / "cb"), "batch_id=1")
    canarygate.exposure_partial(
        docs.filter(F.col("doc_id") % 3 == 0)
    ).write.mode("overwrite").parquet(out)
    r = canarygate.read_leak_card(spark, str(tmp_path / "cb")).collect()[0]
    assert (r.n_planted, r.n_docs_leaked, r.n_leak_rollouts,
            r.exposure_ppm) == b
    # batch parity: merged partials == the one-pass batch card
    docs.createOrReplaceTempView("documents")
    c = spark.sql(canary._sql("spark", canary._CARD_TAIL)).collect()[0]
    assert a == (c.n_planted, c.n_docs_leaked, c.n_leak_rollouts,
                 c.exposure_ppm)
    assert a[0] > 0  # fixture plants exist
