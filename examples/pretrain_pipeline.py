"""End-to-end pretraining data-ORDER pipeline — the round-12
families composed into one run:

    corpus → data-recipe planning (per-source quotas/epochs, repeat
    cliff) → quality-curriculum phase assignment → within the anneal
    slice, ICLM semantic ordering (related docs adjacent) → FFD
    whole-doc packing of the anneal slice → fill-rate report → one
    JSON metrics line

Usage:
    python examples/pretrain_pipeline.py [sf_dir]

Every stage is the SAME machinery the hash-gated driver queries run —
the example only rewires which ``documents`` view each stage sees, so
the curriculum slice the ICP order and packer consume is genuinely
the anneal-phase subset. At 100 TB the posture is unchanged: the
recipe and curriculum card are per-source/P-row rollups, ranks and
offsets ride the exclusive prefix sum, the FFD trajectory sees only
a 16-row histogram, and the semantic order rides the
session-materialized IVF assignment.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

from pyspark.sql import functions as F  # noqa: E402

from dataset_batch_processor_spark import catalog  # noqa: E402
from dataset_batch_processor_spark.operators import (  # noqa: E402
    curriculum,
    ffdpack,
    icp,
    recipe,
)
from dataset_batch_processor_spark.operators.chat import (  # noqa: E402
    CHAT_DOC_LENS_SPARK,
)
from dataset_batch_processor_spark.operators.similarity import (  # noqa: E402
    ivf_flat_assign,
)
from dataset_batch_processor_spark.operators.textops import (  # noqa: E402
    exclusive_prefix_sum,
)
from dataset_batch_processor_spark.session import get_spark  # noqa: E402


def run(spark, sf_dir: str) -> dict:
    metrics: dict = {}

    # 1. recipe: the launch budget table (and its planted-skew probe)
    rec = recipe._q_recipe(spark, sf_dir)
    metrics["recipe_sources"] = rec.filter("grain = 'source'").count()
    metrics["repeat_risk_sources"] = rec.filter(
        "grain = 'source' AND repeat_risk"
    ).count()

    # 2. curriculum: phase assignment; keep the ANNEAL slice (the
    #    highest-quality quarter a decay phase trains on)
    card = {
        r["phase"]: r
        for r in curriculum._q_curriculum(spark, sf_dir).collect()
    }
    metrics["phases"] = len(card)
    anneal = curriculum.N_PHASES - 1
    metrics["anneal_docs"] = int(card[anneal]["n_docs"])
    metrics["anneal_min_score"] = int(card[anneal]["min_score"])
    # the per-doc phase table, re-derived with the same gated chain
    scored = spark.sql(
        f"WITH {curriculum._scored_sql('spark')} SELECT * FROM scored"
    )
    ranked = exclusive_prefix_sum(
        scored.withColumn("_one", F.lit(1)), ["q", "doc_id"], "_one", "rnk"
    )
    total = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    phased = ranked.crossJoin(F.broadcast(total)).selectExpr(
        "doc_id", f"(rnk * {curriculum.N_PHASES}) DIV c AS phase"
    )
    anneal_ids = phased.filter(F.col("phase") == anneal).select("doc_id")

    # 3. ICLM semantic order over the anneal slice: related docs
    #    adjacent (the IVF assignment is the session index)
    assign = ivf_flat_assign(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), "centroid_id"
    )
    anneal_assign = anneal_ids.join(assign, "doc_id")
    metrics["anneal_clusters"] = anneal_assign.select(
        "centroid_id"
    ).distinct().count()

    # 4. FFD-pack the anneal slice: restrict the documents view, then
    #    run the gated assignment over it
    docs = catalog.load_table(spark, sf_dir, "documents")
    docs.join(anneal_ids, "doc_id").createOrReplaceTempView("documents")
    asgn = ffdpack.ffd_assign(spark)
    bins = asgn.groupBy("bin_id").agg(
        F.sum("blen").cast("bigint").alias("padded_tokens")
    )
    metrics["anneal_bins"] = bins.count()
    metrics["anneal_docs_packed"] = asgn.count()
    metrics["anneal_fill_ppm"] = int(
        bins.agg(
            (
                F.sum("padded_tokens") * 1000000
                / (F.count(F.lit(1)) * ffdpack.SEQ_BUDGET)
            ).cast("bigint")
        ).collect()[0][0]
    )
    # restore the full view for any later consumer
    docs.createOrReplaceTempView("documents")
    return metrics


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("pretrain-pipeline")
    print(json.dumps(run(spark, sf_dir)))


if __name__ == "__main__":
    main()
