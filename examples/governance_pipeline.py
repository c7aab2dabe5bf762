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
from dataset_batch_processor_spark.multimodal import qimage  # noqa: E402
from dataset_batch_processor_spark.session import get_spark  # noqa: E402


def run(spark, sf_dir: str, out_dir: str) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    metrics: dict = {}
    docs = catalog.load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    n_docs = docs.count()
    metrics["n_docs"] = n_docs

    # 1. PII scrub over the whole corpus (masked text is what ships)
    scrubbed = docs.select(
        "doc_id",
        textclean.clean_text(F.col("text")).alias("text"),
        "lang",
        "source",
    )
    metrics["n_scrubbed"] = scrubbed.count()

    # 2. eval decontamination: drop train docs sharing 8-grams with
    #    the eval slice (the gated inverted-index join)
    contaminated = decontam.QUERIES["docs_decontaminate"](
        spark, sf_dir
    ).select("doc_id")
    metrics["n_contaminated"] = contaminated.count()

    # 3. canary exposure: drop docs whose planted canary leaked into
    #    any rollout window (memorization risk)
    leaked = (
        spark.sql(canary.EXPOSURE_SPARK)
        .filter(F.col("leaked"))
        .select("doc_id")
    )
    metrics["n_leaked"] = leaked.count()
    metrics["exposure_ppm"] = spark.sql(canary.CARD_SPARK).collect()[0][
        "exposure_ppm"
    ]

    # 4. image provenance: the watermark probe must recover EVERY
    #    payload bit-exactly or the release aborts (a failed recovery
    #    means the image path corrupted provenance bits)
    wm = qimage.QUERIES["mm_watermark_lsb_roundtrip"](spark, sf_dir)
    import hashlib

    bad = 0
    for r in wm.collect():
        want = hashlib.md5(f"{r['doc_id']}:wm".encode()).hexdigest()[:16]
        bad += r["payload_hex"] != want
    metrics["n_watermark_failures"] = bad
    if bad:
        raise RuntimeError(f"provenance check failed on {bad} images")

    # 5. publish: scrubbed text minus contaminated minus leaked
    publish = scrubbed.join(contaminated, "doc_id", "anti").join(
        leaked, "doc_id", "anti"
    )
    metrics["n_published"] = publish.count()
    publish.write.mode("errorifexists").parquet(
        os.path.join(out_dir, "clean_corpus")
    )
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
