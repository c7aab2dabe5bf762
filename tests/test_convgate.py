"""Streaming conversation-validation admission: arrival-order
invariance, idempotent retry commits, and batch parity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import chatvalidate
from dataset_batch_processor_spark.streaming import convgate

SF = "/root/testdata/sf0.001"


def _counts_from_partials(spark, docs, splits, commits_dir):
    """Simulate the foreachBatch loop batch-by-batch (module-level
    process function, the turndedup testing convention)."""
    for batch_id, pred in enumerate(splits):
        out = os.path.join(commits_dir, f"batch_id={batch_id}")
        convgate.validation_partial(docs.filter(pred)).write.mode(
            "overwrite"
        ).parquet(out)
    return {
        (r["decision"], r["reason"]): r["n_convs"]
        for r in convgate.read_validation(spark, commits_dir).collect()
    }


def test_arrival_order_invariant_and_batch_parity(spark, tmp_path):
    docs = catalog.load_table(spark, SF, "documents").select(
        "doc_id", "text"
    )
    a = _counts_from_partials(
        spark, docs,
        [F.col("doc_id") % 3 == i for i in (0, 1, 2)],
        str(tmp_path / "ca"),
    )
    b = _counts_from_partials(
        spark, docs,
        [F.col("doc_id") % 3 == i for i in (2, 0, 1)],
        str(tmp_path / "cb"),
    )
    assert a == b
    # batch parity: merged partials == the one-pass batch rollup
    batch = {
        (r["decision"], r["reason"]): r["n_convs"]
        for r in chatvalidate.QUERIES["docs_chat_validate_counts"](
            spark, SF
        ).collect()
    }
    assert a == batch


def test_retried_batch_replaces_its_partition(spark, tmp_path):
    docs = catalog.load_table(spark, SF, "documents").select(
        "doc_id", "text"
    )
    commits = str(tmp_path / "cr")
    splits = [F.col("doc_id") % 2 == i for i in (0, 1)]
    first = _counts_from_partials(spark, docs, splits, commits)
    # replay batch 0 (at-least-once): totals must not double-count
    convgate.validation_partial(docs.filter(splits[0])).write.mode(
        "overwrite"
    ).parquet(os.path.join(commits, "batch_id=0"))
    again = {
        (r["decision"], r["reason"]): r["n_convs"]
        for r in convgate.read_validation(spark, commits).collect()
    }
    assert again == first
