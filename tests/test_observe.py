"""Streaming observability: observe() metrics must surface through
the listener with zero extra passes over the data."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from dataset_batch_processor_spark.streaming import observe


def test_observed_metrics_reach_listener(spark, tmp_path):
    src = str(tmp_path / "src")
    for part in range(3):
        spark.range(part * 10, part * 10 + 10).selectExpr(
            "id", "id * 2 AS v"
        ).coalesce(1).write.mode("append").parquet(src)

    rec = observe.MetricsRecorder()
    spark.streams.addListener(rec)
    try:
        stream = (
            spark.readStream.schema("id long, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream = observe.observed(
            stream,
            "ingest",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("v").alias("v_sum"),
        )
        q = (
            stream.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener callbacks are async — allow the bus to drain
        deadline = time.time() + 30
        while (
            rec.total_input_rows() < 30 and time.time() < deadline
        ):
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(rec)

    assert rec.total_input_rows() == 30
    counts = rec.observed_series("ingest", "n_rows")
    sums = rec.observed_series("ingest", "v_sum")
    assert sum(counts) == 30
    # every id counted exactly once: sum of 2*id over 0..29
    assert sum(sums) == 2 * sum(range(30))
