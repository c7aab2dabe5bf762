"""Round-11 growth study for the new gates: measured curves, not
postures.

A. Conversation-pipeline gates wall vs corpus fanout (1x/4x/16x/64x):
   validation (docs_chat_validate), turn-grain decontam
   (docs_chat_decontam), and the SFT data card (which composes five
   chains). All are one-turns-chain passes with doc-keyed windows +
   source-keyed rollups; the claim is linear wall, no global-window
   funnel.
B. Frozen-tokenizer apply: the artifact is built ONCE (fixed-size,
   corpus-independent after training); the apply wall should track
   the arriving batch's DISTINCT-WORD count, which saturates on a
   closed vocabulary — the real 100-TB lever (token volume grows,
   distinct words don't).
C. MMR re-rank at a FIXED query panel vs corpus fanout: the candidate
   pool and the MMR rounds are panel-bounded, so wall should track
   the one broadcast-panel corpus scan linearly. (A panel that grew
   with the corpus would square the scan — the production posture is
   the fixed sampled-QA panel, similarity.py's stance.)

Usage: python tools/round11_scale_study.py
Prints markdown tables + one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import (
    bpe,
    chatvalidate,
    datacard,
    decontam,
    mmr,
)
from dataset_batch_processor_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
RESULTS: dict = {}


def _fanout_docs(spark, mult: int):
    from studylib import fanout_table

    return fanout_table(spark, SF_DIR, "documents", "doc_id", mult)


def study_a(spark):
    print("\n## A. conversation-gate wall vs fanout\n")
    print("| mult | docs | validate_s | decontam_s | sft_card_s |")
    print("|---|---|---|---|---|")
    rows = []
    for mult in (1, 4, 16, 64):
        docs = _fanout_docs(spark, mult).persist()
        n = docs.count()
        docs.createOrReplaceTempView("documents")

        t0 = time.time()
        spark.sql(chatvalidate.CHAT_VALIDATE_SPARK).count()
        validate_s = time.time() - t0

        t0 = time.time()
        spark.sql(decontam.CHAT_DECONTAM_SPARK).count()
        decontam_s = time.time() - t0

        # the card over the fanned-out view: the one registration seam
        # (datacard.register_sft_card_views builds the component views
        # from the CURRENT documents view; the _q wrapper would reset
        # the view to the parquet table)
        t0 = time.time()
        datacard.register_sft_card_views(spark)
        spark.sql(datacard.SFT_CARD_SPARK).count()
        card_s = time.time() - t0

        docs.unpersist()
        print(f"| {mult}x | {n} | {validate_s:.2f} | {decontam_s:.2f} "
              f"| {card_s:.2f} |")
        rows.append(
            dict(mult=mult, docs=n, validate_s=round(validate_s, 2),
                 decontam_s=round(decontam_s, 2),
                 sft_card_s=round(card_s, 2))
        )
    RESULTS["conversation_gates"] = rows


def study_b(spark):
    print("\n## B. frozen-apply wall vs batch fanout\n")
    print("| mult | batch_docs | distinct_words | apply_s |")
    print("|---|---|---|---|")
    # artifact built once at the base corpus — frozen thereafter
    art_rows = sorted(
        (int(r["merge_rank"]), r["lhs"], r["rhs"])
        for r in bpe.bpe_merges_artifact(spark, SF_DIR).collect()
    )
    merges = [(lhs, rhs) for _, lhs, rhs in art_rows]
    enc = ("'_' || concat_ws('__', regexp_extract_all(w, '.', 0))"
           " || '__</w>_'")
    applied = bpe._fold_merges(enc, merges)
    rows = []
    for mult in (1, 4, 16, 64):
        docs = _fanout_docs(spark, mult).persist()
        docs.createOrReplaceTempView("documents")
        batch_docs = docs.filter(
            f"doc_id % {bpe.NEW_BATCH_MOD} = {bpe.NEW_BATCH_RESIDUE}"
        ).count()
        t0 = time.time()
        out = spark.sql(f"""
WITH {bpe._NEW_WORDS_SPARK}
SELECT w, {bpe._tokens_expr(applied, 'spark')}
FROM new_words
""")
        n_words = out.count()
        apply_s = time.time() - t0
        docs.unpersist()
        print(f"| {mult}x | {batch_docs} | {n_words} | {apply_s:.2f} |")
        rows.append(
            dict(mult=mult, batch_docs=batch_docs, distinct_words=n_words,
                 apply_s=round(apply_s, 2))
        )
    RESULTS["frozen_apply"] = rows


def study_c(spark):
    print("\n## C. MMR wall vs corpus fanout (FIXED panel)\n")
    print("| mult | vectors | panel | mmr_s |")
    print("|---|---|---|---|")
    from dataset_batch_processor_spark.operators.similarity import QUERY_MOD

    emb0 = catalog.load_table(spark, SF_DIR, "embeddings")
    rows = []
    for mult in (1, 4, 16):
        if mult == 1:
            emb = emb0
        else:
            # new copies get UNIQUE vec_ids above the original range
            # and != 0 mod QUERY_MOD, so the panel stays the base one:
            # id' = (max_id + 1 + vec_id*mult + m) * QUERY_MOD + 1
            max_id = emb0.agg(F.max("vec_id")).collect()[0][0]
            emb = emb0.unionByName(
                emb0.crossJoin(
                    F.broadcast(
                        spark.range(1, mult).withColumnRenamed("id", "_m")
                    )
                )
                .withColumn(
                    "vec_id",
                    (
                        F.lit(int(max_id) + 1)
                        + F.col("vec_id") * mult + F.col("_m")
                    ) * F.lit(QUERY_MOD) + F.lit(1),
                )
                .drop("_m")
            )
        emb = emb.persist()
        n = emb.count()
        panel = emb.filter(F.col("vec_id") % QUERY_MOD == 0).count()
        t0 = time.time()
        mmr.mmr_topk(emb).count()
        mmr_s = time.time() - t0
        emb.unpersist()
        print(f"| {mult}x | {n} | {panel} | {mmr_s:.2f} |")
        rows.append(dict(mult=mult, vectors=n, panel=panel,
                         mmr_s=round(mmr_s, 2)))
    RESULTS["mmr_fixed_panel"] = rows


def main():
    spark = get_spark("round11-scale-study", shuffle_partitions=32)
    study_a(spark)
    study_b(spark)
    study_c(spark)
    print("\n" + json.dumps(RESULTS))


if __name__ == "__main__":
    main()
