"""Round-10 growth study for the new SFT/RLHF families: measured
curves, not postures.

A. Chat render + loss mask + sequence packing wall vs corpus fanout
   (1x/4x/16x/64x). All three are explode -> doc-keyed groupBy (+ the
   W1 two-level prefix sum for packing); the claim is linear wall with
   no global-window funnel. The packer's prefix sum is the one stage
   with a theoretical serialization risk — measure it.
B. Turn-level near-dup growth: candidate pairs, DISTINCT turn units,
   and the MAX band-bucket size vs fanout. Turn contents come from a
   small vocabulary, so this is the family most likely to produce the
   boilerplate mega-bucket the default cap exists for: measure how
   close the fixture gets to DEFAULT_MAX_BUCKET_SIZE=256 and what the
   cap drops.
C. Naive-Bayes lang-ID train wall vs fanout — ONE aggregation pass
   (the count-once claim vs the perceptron's E epochs): wall should
   track the bigram explode linearly.

Usage: python tools/round10_scale_study.py
Prints markdown tables + one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import chat, dedup, langid
from dataset_batch_processor_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
RESULTS: dict = {}


def _fanout_docs(spark, mult: int):
    from studylib import fanout_table

    return fanout_table(spark, SF_DIR, "documents", "doc_id", mult)


def study_a(spark):
    print("\n## A. chat family wall vs fanout\n")
    print("| mult | docs | render_s | mask_s | pack_s | pack_seqs |")
    print("|---|---|---|---|---|---|")
    rows = []
    for mult in (1, 4, 16, 64):
        docs = _fanout_docs(spark, mult).persist()
        n = docs.count()
        docs.createOrReplaceTempView("documents")

        t0 = time.time()
        spark.sql(chat.CHAT_RENDER_SPARK).count()
        render_s = time.time() - t0

        t0 = time.time()
        spark.sql(chat.CHAT_LOSS_MASK_SPARK).count()
        mask_s = time.time() - t0

        t0 = time.time()
        from dataset_batch_processor_spark.operators.textops import (
            exclusive_prefix_sum,
        )

        lens = spark.sql(chat.CHAT_DOC_LENS_SPARK)
        exclusive_prefix_sum(
            lens, ["doc_id"], "doc_len", "s"
        ).createOrReplaceTempView("doc_offs")
        spark.sql(chat.CHAT_TURN_SPANS_SPARK).createOrReplaceTempView(
            "turn_spans"
        )
        n_seqs = spark.sql(
            "WITH _x AS (SELECT 1)" + chat._pack_tail("spark")
        ).count()
        pack_s = time.time() - t0

        docs.unpersist()
        print(f"| {mult}x | {n} | {render_s:.2f} | {mask_s:.2f} "
              f"| {pack_s:.2f} | {n_seqs} |")
        rows.append(
            dict(mult=mult, docs=n, render_s=round(render_s, 2),
                 mask_s=round(mask_s, 2), pack_s=round(pack_s, 2),
                 n_seqs=n_seqs)
        )
    RESULTS["chat_wall"] = rows


def study_b(spark):
    print("\n## B. turn near-dup growth\n")
    print("| mult | turn_units | pairs | max_bucket | rows_capped |")
    print("|---|---|---|---|---|")
    rows = []
    for mult in (1, 4, 16):
        docs = _fanout_docs(spark, mult).persist()
        docs.createOrReplaceTempView("documents")
        units = spark.sql(
            f"WITH {chat._TOKS_SPARK},\n{chat._TURNS_SPARK}\n"
            f"{chat._TURN_DOCS_SPARK}"
        ).persist()
        n_units = units.count()
        bands = dedup.lsh_bands_df(
            dedup.minhash_signatures_df(units)
        ).persist()
        bsz = bands.groupBy("band", "bucket").count()
        max_bucket = bsz.agg(F.max("count")).collect()[0][0]
        capped = (
            bsz.filter(F.col("count") > dedup.DEFAULT_MAX_BUCKET_SIZE)
            .agg(F.coalesce(F.sum("count"), F.lit(0)))
            .collect()[0][0]
        )
        n_pairs = dedup._bucket_pairs(bands).count()
        bands.unpersist(); units.unpersist(); docs.unpersist()
        print(f"| {mult}x | {n_units} | {n_pairs} | {max_bucket} "
              f"| {capped} |")
        rows.append(
            dict(mult=mult, units=n_units, pairs=n_pairs,
                 max_bucket=int(max_bucket), capped_rows=int(capped))
        )
    RESULTS["turn_near_dup"] = rows


def study_c(spark):
    print("\n## C. NB lang-ID train wall vs fanout\n")
    print("| mult | docs | train_s |")
    print("|---|---|---|")
    rows = []
    for mult in (1, 4, 16, 64):
        docs = _fanout_docs(spark, mult).persist()
        n = docs.count()
        docs.createOrReplaceTempView("documents")
        t0 = time.time()
        spark.sql(langid.LANGID_TRAIN_SPARK).count()
        train_s = time.time() - t0
        docs.unpersist()
        print(f"| {mult}x | {n} | {train_s:.2f} |")
        rows.append(dict(mult=mult, docs=n, train_s=round(train_s, 2)))
    RESULTS["langid_train"] = rows


def main():
    spark = get_spark("round10-scale-study", shuffle_partitions=32)
    study_a(spark)
    study_b(spark)
    study_c(spark)
    print("\n" + json.dumps(RESULTS))


if __name__ == "__main__":
    main()
