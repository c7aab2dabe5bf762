"""Streaming margin-distribution monitor: arrival-order invariance,
idempotent retry, and batch parity against the gated histogram."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import preference
from dataset_batch_processor_spark.streaming import prefgate

SF = "/root/testdata/sf0.001"


def _hist_from_partials(spark, docs, splits, commits_dir):
    for batch_id, pred in enumerate(splits):
        out = os.path.join(commits_dir, f"batch_id={batch_id}")
        prefgate.margin_partial(docs.filter(pred)).write.mode(
            "overwrite"
        ).parquet(out)
    return {
        r["margin_bucket"]: (r["n_pairs"], r["min_margin"], r["max_margin"])
        for r in prefgate.read_margins(spark, commits_dir).collect()
    }


def test_order_invariance_retry_and_batch_parity(spark, tmp_path):
    docs = catalog.load_table(spark, SF, "documents").select(
        "doc_id", "text"
    )
    a = _hist_from_partials(
        spark, docs,
        [F.col("doc_id") % 3 == i for i in (0, 1, 2)],
        str(tmp_path / "ca"),
    )
    b = _hist_from_partials(
        spark, docs,
        [F.col("doc_id") % 3 == i for i in (2, 0, 1)],
        str(tmp_path / "cb"),
    )
    assert a == b
    # retry: re-commit batch 1 into the same partition — unchanged
    out = os.path.join(str(tmp_path / "cb"), "batch_id=1")
    prefgate.margin_partial(docs.filter(F.col("doc_id") % 3 == 0)).write.mode(
        "overwrite"
    ).parquet(out)
    again = {
        r["margin_bucket"]: (r["n_pairs"], r["min_margin"], r["max_margin"])
        for r in prefgate.read_margins(spark, str(tmp_path / "cb")).collect()
    }
    assert again == b
    # batch parity: drained stream == the one-pass batch histogram
    docs.createOrReplaceTempView("documents")
    batch = {
        r["margin_bucket"]: (r["n_pairs"], r["min_margin"], r["max_margin"])
        for r in spark.sql(preference.MARGIN_HIST_SPARK).collect()
    }
    assert a == batch
