"""Count-min sketch: streaming accumulation must merge to the exact
batch grid, and the estimate invariant must hold."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import cms


def test_streaming_grid_equals_batch(spark, sf_dir, tmp_path):
    events = catalog.load_table(spark, sf_dir, "events").select("user_id")

    stage = str(tmp_path / "stage")
    for part in range(3):
        events.filter(F.col("user_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(stage)

    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = cms.accumulate_cms(
        stream,
        counters_dir=str(tmp_path / "counters"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    streamed = {
        (r.row_idx, r.col): r.counter
        for r in cms.read_cms(spark, str(tmp_path / "counters")).collect()
    }
    batch = {
        (r.row_idx, r.col): r.counter
        for r in cms.cms_partial(events).collect()
    }
    assert streamed == batch
    assert sum(batch.values()) == events.count() * cms.CMS_D


def test_estimate_never_underestimates(spark, sf_dir):
    rows = cms.QUERIES["events_cms_heavy_hitters"](spark, sf_dir).collect()
    assert rows
    assert all(r.never_underestimates for r in rows)
    assert all(r.est >= r.exact_cnt for r in rows)
