"""End-to-end data-governance sweep — the release gate a training-data
pipeline runs BEFORE publishing a corpus snapshot, composing the
governance families into one pass:

    PII scrub (emails/URLs/long numbers masked) → eval-set 8-gram
    decontamination → canary plant + memorization-exposure probe →
    image provenance-watermark verification → published clean corpus
    (parquet) + one JSON governance card

Usage:
    python examples/governance_pipeline.py [sf_dir] [out_dir]

Every stage is the SAME machinery the hash-gated driver queries run.
The gate is real: docs that share 8-grams with the eval slice or
whose canary leaked into a rollout window are EXCLUDED from the
published snapshot, and the governance card records exactly what was
removed and why — the audit trail a data release ships with.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from dataset_batch_processor_spark import catalog  # noqa: E402
from dataset_batch_processor_spark.operators import (  # noqa: E402
    canary,
    decontam,
    textclean,
)
from dataset_batch_processor_spark.operators.rlvr import (  # noqa: E402
    N_ROLLOUTS,
)
from dataset_batch_processor_spark.multimodal import qimage  # noqa: E402
from dataset_batch_processor_spark.session import get_spark  # noqa: E402


# every PII_PLANT_MOD-th doc gets a synthetic contact line appended
# before the scrub, so the example (and its test) demonstrably
# exercises the masks on text that genuinely carries PII
PII_PLANT_MOD = 7


def run(spark, sf_dir: str, out_dir: str) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    metrics: dict = {}
    docs = catalog.load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    n_docs = docs.count()
    metrics["n_docs"] = n_docs

    # 1. PII scrub over the whole corpus (masked text is what ships);
    #    a planted slice carries a synthetic contact line so the masks
    #    are exercised on real PII shapes, not vacuously
    planted_pii = F.when(
        F.col("doc_id") % PII_PLANT_MOD == 1,
        F.concat(
            F.col("text"),
            F.lit(" contact: user"), F.col("doc_id"),
            F.lit("@example.com via https://ex.org/u/"), F.col("doc_id"),
        ),
    ).otherwise(F.col("text"))
    metrics["n_pii_planted"] = docs.filter(
        F.col("doc_id") % PII_PLANT_MOD == 1
    ).count()
    scrubbed = docs.select(
        "doc_id",
        textclean.clean_text(planted_pii).alias("text"),
        "lang",
        "source",
    )
    metrics["n_scrubbed"] = scrubbed.count()

    # 2. eval decontamination: the eval slice itself NEVER ships in a
    #    training snapshot, and train docs sharing 8-grams with it are
    #    dropped (the gated inverted-index join)
    eval_slice = docs.filter(
        F.col("doc_id") % decontam.EVAL_MOD == 0
    ).select("doc_id")
    metrics["n_eval_held_out"] = eval_slice.count()
    contaminated = (
        decontam.QUERIES["docs_decontaminate"](spark, sf_dir)
        .select("doc_id")
        .persist()  # reused by the anti join and the count
    )
    metrics["n_contaminated"] = contaminated.count()

    # 3. canary exposure: drop docs whose planted canary leaked into
    #    any rollout window (memorization risk); exposure_ppm derives
    #    from the SAME exposure rows — no second pass over the chain
    exposure = spark.sql(canary.EXPOSURE_SPARK).persist()
    leaked = exposure.filter(F.col("leaked")).select("doc_id")
    metrics["n_leaked"] = leaked.count()
    agg = exposure.agg(
        F.sum("n_leaking_rollouts").alias("n_leak"),
        F.count(F.lit(1)).alias("n_planted"),
    ).collect()[0]
    metrics["exposure_ppm"] = int(
        agg["n_leak"] * 1_000_000 // (agg["n_planted"] * N_ROLLOUTS)
    )

    # 4. image provenance: the watermark probe must recover EVERY
    #    payload bit-exactly or the release aborts. The expected
    #    payload is recomputed in SQL and the mismatch count
    #    aggregates distributed — one row to the driver, never the
    #    per-image table.
    wm = qimage.QUERIES["mm_watermark_lsb_roundtrip"](spark, sf_dir)
    bad = (
        wm.filter(
            F.col("payload_hex")
            != F.expr("substr(md5(concat(doc_id, ':wm')), 1, 16)")
        ).count()
    )
    metrics["n_watermark_failures"] = bad
    if bad:
        raise RuntimeError(f"provenance check failed on {bad} images")

    # 5. publish: scrubbed text minus eval minus contaminated minus
    #    leaked
    publish = (
        scrubbed.join(eval_slice, "doc_id", "anti")
        .join(contaminated, "doc_id", "anti")
        .join(leaked, "doc_id", "anti")
    )
    metrics["n_published"] = publish.count()
    publish.write.mode("errorifexists").parquet(
        os.path.join(out_dir, "clean_corpus")
    )
    contaminated.unpersist()
    exposure.unpersist()
    return metrics


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="governance_pipeline_")
    )
    spark = get_spark("governance-pipeline-example")
    print(json.dumps({"out_dir": out_dir, **run(spark, sf_dir, out_dir)}))


if __name__ == "__main__":
    main()
