"""End-to-end RLVR (verifiable-reward) data pipeline — the rlvr +
canary families composed into one run (the rlhf_pipeline.py sibling
one stage further down the post-training stack):

    rollout generation + verifier grading → no-signal task filtering
    (0% / 100% pass groups carry no GRPO gradient) → group-relative
    advantages → pass@k scoreboard → canary-exposure governance gate
    → published GRPO batch (parquet) + one JSON metrics line

Usage:
    python examples/rlvr_pipeline.py [sf_dir] [out_dir]

Every stage is the SAME machinery the hash-gated driver queries run.
The governance gate is real: tasks whose document leaks its planted
canary into ANY rollout are EXCLUDED from the published batch — the
memorization-risk quarantine a verifiable-reward loop applies before
training on model samples.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from dataset_batch_processor_spark import catalog  # noqa: E402
from dataset_batch_processor_spark.operators import canary, rlvr  # noqa: E402
from dataset_batch_processor_spark.session import get_spark  # noqa: E402


def run(spark, sf_dir: str, out_dir: str) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    metrics: dict = {}
    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )

    # 1. grade every rollout against the verifier; keep the scoreboard
    grade = spark.sql(rlvr.GRADE_SPARK).persist()
    metrics["n_tasks"] = grade.count()
    metrics["n_signal_tasks"] = grade.filter(F.col("has_signal")).count()
    passk = {
        r["k"]: r["pass_at_k_ppm"]
        for r in spark.sql(rlvr.PASSK_SPARK).collect()
    }
    metrics["pass_at_k_ppm"] = {str(k): v for k, v in sorted(passk.items())}

    # 2. group-relative advantages on the signal-bearing tasks
    adv = spark.sql(rlvr.GRPO_SPARK).persist()
    metrics["n_grpo_rows"] = adv.count()

    # 3. governance gate: drop tasks whose planted canary leaked into
    #    any rollout window (memorization-risk quarantine)
    leaked = (
        spark.sql(canary.EXPOSURE_SPARK)
        .filter(F.col("leaked"))
        .select("doc_id")
    )
    metrics["n_leaked_tasks"] = leaked.count()
    card = spark.sql(canary.CARD_SPARK).collect()[0]
    metrics["exposure_ppm"] = card["exposure_ppm"]

    publish = adv.join(leaked, "doc_id", "anti")
    metrics["n_published_rows"] = publish.count()
    publish.write.mode("errorifexists").parquet(
        os.path.join(out_dir, "grpo_batch")
    )
    grade.write.mode("errorifexists").parquet(
        os.path.join(out_dir, "task_scoreboard")
    )
    return metrics


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="rlvr_pipeline_")
    )
    spark = get_spark("rlvr-pipeline-example")
    print(json.dumps({"out_dir": out_dir, **run(spark, sf_dir, out_dir)}))


if __name__ == "__main__":
    main()
