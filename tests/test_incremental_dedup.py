"""Incremental streaming LSH dedup (streaming/incremental.py).

The pinned invariant: incremental ingestion over ANY batch
partitioning of the corpus discovers exactly the batch pipeline's
candidate pairs, each pair exactly once.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators.dedup import lsh_pairs_df
from dataset_batch_processor_spark.streaming import incremental


@pytest.fixture()
def staged(spark, sf_dir):
    """documents split into 3 parquet files by doc_id mod — arrival
    order deliberately interleaves dup partners across batches."""
    docs = catalog.load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    stage = tempfile.mkdtemp(prefix="dbp_inc_stage_")
    for part in range(3):
        docs.filter(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(stage)
    return docs, stage


def test_incremental_equals_batch_pairs(spark, sf_dir, staged):
    docs, stage = staged
    work = tempfile.mkdtemp(prefix="dbp_inc_work_")
    inc = incremental.run_incremental_over_dir(spark, stage, work)
    inc_pairs = {(r.doc_a, r.doc_b) for r in inc.collect()}
    batch_pairs = {
        (r.doc_a, r.doc_b) for r in lsh_pairs_df(docs).collect()
    }
    assert inc_pairs == batch_pairs
    # exactly-once: the raw (pre-distinct) log has no duplicate pairs
    # even ACROSS batch partitions (each pair lives in exactly one
    # batch_id directory)
    raw = spark.read.parquet(os.path.join(work, "pairs")).select(
        "doc_a", "doc_b"
    )
    assert raw.count() == raw.distinct().count()


def test_incremental_single_batch_degenerates_to_batch(spark, sf_dir):
    docs = catalog.load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    stage = tempfile.mkdtemp(prefix="dbp_inc_one_")
    docs.coalesce(1).write.parquet(stage, mode="append")
    work = tempfile.mkdtemp(prefix="dbp_inc_onework_")
    inc = incremental.run_incremental_over_dir(
        spark, stage, work, max_files_per_trigger=10
    )
    assert {(r.doc_a, r.doc_b) for r in inc.collect()} == {
        (r.doc_a, r.doc_b) for r in lsh_pairs_df(docs).collect()
    }
