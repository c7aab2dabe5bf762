"""End-to-end RLHF preference-data pipeline — the preference family
composed into one run (the sft_pipeline.py sibling):

    candidate generation + reward scoring → DPO pair construction →
    margin-distribution audit → reward-ensemble disagreement triage →
    best-of-N selection → policy win rates → Bradley-Terry strengths
    → published preference snapshot (parquet) + one JSON metrics line

Usage:
    python examples/rlhf_pipeline.py [sf_dir] [out_dir]

Every stage is the SAME machinery the hash-gated driver queries run.
The quality loop is real: pairs whose margin lands in bucket 0
(coin-flips) and prompts where the reward ensemble disagrees are
EXCLUDED from the published training pairs — the standard
adjudication split an RLHF data loop applies before paying for
preference training.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from dataset_batch_processor_spark import catalog  # noqa: E402
from dataset_batch_processor_spark.operators import preference  # noqa: E402
from dataset_batch_processor_spark.session import get_spark  # noqa: E402


def run(spark, sf_dir: str, out_dir: str) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    metrics: dict = {}
    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )

    # 1. DPO pairs + the margin audit that decides if they carry signal
    pairs = spark.sql(preference.PREF_PAIRS_SPARK).persist()
    metrics["n_pairs"] = pairs.count()
    hist = {
        r["margin_bucket"]: r["n_pairs"]
        for r in spark.sql(preference.MARGIN_HIST_SPARK).collect()
    }
    metrics["margin_buckets"] = {str(k): v for k, v in sorted(hist.items())}

    # 2. ensemble triage: prompts where the two reward models disagree
    #    go to adjudication, not training
    disagree = (
        spark.sql(preference.ENSEMBLE_SPARK)
        .filter(~F.col("agree"))
        .select("doc_id")
    )
    metrics["n_adjudication"] = disagree.count()

    # 3. publishable training pairs: real margin AND ensemble-agreed
    train_pairs = pairs.filter(
        F.col("margin") >= preference.MARGIN_BUCKET  # out of bucket 0
    ).join(disagree, "doc_id", "anti")
    metrics["n_train_pairs"] = train_pairs.count()
    train_pairs.write.mode("errorifexists").parquet(
        os.path.join(out_dir, "dpo_pairs")
    )

    # 4. best-of-N selection + per-policy tracking numbers
    metrics["n_bestof"] = spark.sql(preference.BESTOF_SPARK).count()
    winrates = spark.sql(preference.WINRATE_SPARK)
    metrics["n_winrate_rows"] = winrates.count()
    strengths = preference.QUERIES["docs_policy_bt_strengths"](
        spark, sf_dir
    )
    metrics["bt_strengths_ppm"] = {
        str(r["policy"]): r["strength_ppm"] for r in strengths.collect()
    }
    strengths.write.mode("errorifexists").parquet(
        os.path.join(out_dir, "policy_strengths")
    )
    return metrics


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="rlhf_pipeline_")
    )
    spark = get_spark("rlhf-pipeline-example")
    print(json.dumps({"out_dir": out_dir, **run(spark, sf_dir, out_dir)}))


if __name__ == "__main__":
    main()
