"""Round-12 (second wave) growth study for the session's new gates:
measured curves, not postures.

A. RLVR grade + pass@k wall vs corpus fanout (1x/4x/16x/64x). Claim:
   the rollout explode is a bounded x8 fan-out and the modal-token
   table is one (doc, token) combine — linear wall; the pass@k join
   is a constant 36-row relation.
B. UL2 denoiser mix wall vs fanout. Claim: identical shape to the
   gated span corruption (one doc-keyed lag/cumsum window) — linear.
C. Cluster-cap window wall vs LABEL-TABLE fanout (the CC build itself
   is measured in earlier rounds' component studies; this isolates
   the new work). Claim: the per-cluster window is cluster-sized and
   the sizes join is comp-keyed — linear in |labels|.
D. Canary exposure card wall vs fanout. Claim: plant is a projection,
   scan a bounded x8 fan-out — linear.
E. Long-context upsample plan wall vs fanout. Claim: one groupBy over
   <=64 buckets — scan-dominated, flat beyond the scan.
F. Shuffle-resume slice wall vs fanout. Claim: the rank pass (prefix
   sum) is the only corpus-sized term; the OUTPUT stays K*B rows at
   any corpus size (asserted).

Usage: python tools/round12b_scale_study.py   (uncontended)
Prints markdown tables + one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from dataset_batch_processor_spark.operators import (
    canary,
    corpusstats,
    curation,
    lmobjectives,
    rlvr,
)
from dataset_batch_processor_spark.session import get_spark
from studylib import fanout_table

SF_DIR = "/root/testdata/sf0.01"
MULTS = (1, 4, 16, 64)
RESULTS: dict = {}


def _fanout_docs(spark, mult: int):
    return fanout_table(spark, SF_DIR, "documents", "doc_id", mult)


def _sweep(spark, name: str, header: str, fn):
    print(f"\n## {header}\n")
    print(f"| mult | docs | {name}_s |")
    print("|---|---|---|")
    rows = []
    for mult in MULTS:
        docs = _fanout_docs(spark, mult).persist()
        n = docs.count()
        docs.createOrReplaceTempView("documents")
        t0 = time.time()
        fn(spark)
        wall = time.time() - t0
        docs.unpersist()
        print(f"| {mult}x | {n} | {wall:.2f} |")
        rows.append({"mult": mult, "docs": n, f"{name}_s": round(wall, 2)})
    RESULTS[name] = rows


def study_c_labels(spark):
    """Cluster-cap window over a fanned-out label table."""
    from dataset_batch_processor_spark.operators.components import (
        CLUSTER_CAP,
    )
    from pyspark.sql import Window

    print("\n## C. cluster-cap window wall vs label-table fanout\n")
    print("| mult | labels | cap_s |")
    print("|---|---|---|")
    base = spark.range(2000).select(
        F.col("id").alias("node"),
        (F.col("id") % 400).alias("comp"),  # clusters of 5
    )
    rows = []
    for mult in MULTS:
        labels = (
            base.crossJoin(
                F.broadcast(spark.range(mult).withColumnRenamed("id", "_m"))
            )
            .select(
                (F.col("node") * mult + F.col("_m")).alias("node"),
                (F.col("comp") * mult + F.col("_m")).alias("comp"),
            )
            .persist()
        )
        n = labels.count()
        t0 = time.time()
        sizes = labels.groupBy("comp").agg(F.count("*").alias("sz"))
        w = Window.partitionBy("comp").orderBy(
            F.expr(
                "CAST(conv(substr(md5(concat(node, ':cap')), 1, 7),"
                " 16, 10) AS BIGINT)"
            ).asc(),
            F.col("node").asc(),
        )
        kept = (
            labels.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= CLUSTER_CAP)
            .join(sizes, "comp")
        )
        kept.count()
        wall = time.time() - t0
        labels.unpersist()
        print(f"| {mult}x | {n} | {wall:.2f} |")
        rows.append({"mult": mult, "labels": n, "cap_s": round(wall, 2)})
    RESULTS["cluster_cap_window"] = rows


def main():
    spark = get_spark("round12b-study")

    _sweep(
        spark, "rlvr", "A. RLVR grade + pass@k wall vs corpus fanout",
        lambda s: (
            s.sql(rlvr.GRADE_SPARK).count(),
            s.sql(rlvr.PASSK_SPARK).count(),
        ),
    )
    _sweep(
        spark, "ul2", "B. UL2 denoiser mix wall vs corpus fanout",
        lambda s: s.sql(lmobjectives.UL2_DOC_SPARK).count(),
    )
    study_c_labels(spark)
    _sweep(
        spark, "canary", "D. canary exposure card wall vs corpus fanout",
        lambda s: s.sql(canary.CARD_SPARK).count(),
    )
    _sweep(
        spark, "longctx", "E. long-context plan wall vs corpus fanout",
        lambda s: s.sql(corpusstats.LONGCTX_PLAN_SPARK).count(),
    )

    # sanity: the real driver query produces exactly K*B rows before
    # any fanout math is trusted
    assert (
        curation._q_shuffle_resume_slice(spark, SF_DIR).count()
        == curation.RESUME_NBATCH * curation.RESUME_BATCH
    )

    # _q_shuffle_resume_slice re-registers the documents view from
    # sf_dir; sweep over the fanned view by calling the inner SQL shape
    def resume_fanned(s):
        from dataset_batch_processor_spark.operators.textops import (
            exclusive_prefix_sum,
        )

        perm = s.sql(
            f"""SELECT doc_id, CAST(k % {curation.EPOCH_SHARDS} AS INT)
                       AS shard, k AS sort_key
                FROM (SELECT doc_id,
                             CAST(conv(substr(md5(concat('epoch{curation.EPOCH}:',
                                    CAST(doc_id AS STRING))), 1, 15), 16, 10)
                                  AS BIGINT) AS k
                      FROM documents)"""
        ).withColumn("one", F.lit(1).cast("bigint"))
        ranked = exclusive_prefix_sum(
            perm, ["shard", "sort_key", "doc_id"], "one", out_col="pos"
        )
        lo = curation.RESUME_STEP * curation.RESUME_BATCH
        hi = lo + curation.RESUME_NBATCH * curation.RESUME_BATCH
        n = ranked.filter(
            (F.col("pos") >= lo) & (F.col("pos") < hi)
        ).count()
        assert n == curation.RESUME_NBATCH * curation.RESUME_BATCH, n

    _sweep(
        spark, "resume",
        "F. shuffle-resume slice wall vs corpus fanout (output fixed K*B)",
        resume_fanned,
    )

    from dataset_batch_processor_spark.operators import curriculum

    _sweep(
        spark, "anneal",
        "G. epoch-anneal mixture schedule wall vs corpus fanout",
        lambda s: s.sql(curriculum._anneal_sql("spark")).count(),
    )

    # watermark: the kernel is per-row codec work — measure it over
    # the fanned id list directly
    def wm_fanned(s):
        from dataset_batch_processor_spark.multimodal.qimage import (
            WATERMARK_SCHEMA,
            _watermark_kernel,
        )

        s.table("documents").select("doc_id").repartition(64).mapInPandas(
            _watermark_kernel, schema=WATERMARK_SCHEMA
        ).count()

    _sweep(
        spark, "watermark",
        "H. LSB watermark embed/recover wall vs corpus fanout",
        wm_fanned,
    )

    print("\n" + json.dumps(RESULTS))


if __name__ == "__main__":
    main()
