"""Round-12 growth study for the new gates: measured curves, not
postures.

A. FFD packer wall vs corpus fanout (1x/4x/16x/64x). Claim: the
   driver trajectory sees a <=16-row histogram at ANY corpus size
   (bucketed lengths are a closed set), so wall tracks the one
   prefix-sum rank + broadcast segment join linearly; segment count
   stays O(rounds * runs), corpus-independent.
B. Prefix-grouped serving order wall vs fanout. Claim: grouping is
   digest-keyed, serve numbering rides the prefix sum — linear wall,
   no global-window funnel. Group count grows with the corpus but
   per-group windows stay group-sized.
C. Streaming quota admission: per-shard partial wall vs shard fanout
   (the corpus-sized term), and merge-on-read wall vs NUMBER of
   committed batches (the admission-time term). Claim: partial
   linear in shard size; merge is |batches| x |sources| x K rows —
   index-sized, flat in corpus terms.
D. Preference length-bias audit wall vs fanout. Claim: one extra
   projection over the bounded pairs join — linear, fixed-cost
   dominated at study scale.

Usage: python tools/round12_scale_study.py   (uncontended)
Prints markdown tables + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog, matcache
from dataset_batch_processor_spark.operators import (
    chat,
    ffdpack,
    preference,
)
from dataset_batch_processor_spark.session import get_spark
from dataset_batch_processor_spark.streaming import quotagate

SF_DIR = "/root/testdata/sf0.01"
RESULTS: dict = {}


def _fanout_docs(spark, mult: int):
    from studylib import fanout_table

    return fanout_table(spark, SF_DIR, "documents", "doc_id", mult)


def study_a(spark):
    print("\n## A. FFD packer wall vs corpus fanout\n")
    print("| mult | docs | hist_rows | segments | bins | ffd_s |")
    print("|---|---|---|---|---|---|")
    rows = []
    for mult in (1, 4, 16, 64):
        docs = _fanout_docs(spark, mult).persist()
        n = docs.count()
        docs.createOrReplaceTempView("documents")
        t0 = time.time()
        asgn = ffdpack.ffd_assign(spark)
        n_assigned = asgn.count()
        ffd_s = time.time() - t0
        # trajectory shape at this scale (re-derived, cheap)
        lens = spark.sql(ffdpack.CHAT_DOC_LENS_SPARK)
        hist = {
            int(r["blen"]): int(r["n"])
            for r in lens.selectExpr(
                f"{ffdpack._blen_expr('DIV')} AS blen"
            ).groupBy("blen").agg(F.count("*").alias("n")).collect()
        }
        segs, n_bins = ffdpack.ffd_segments(hist)
        docs.unpersist()
        assert n_assigned == n
        print(f"| {mult}x | {n} | {len(hist)} | {len(segs)} | {n_bins} "
              f"| {ffd_s:.2f} |")
        rows.append(dict(mult=mult, docs=n, hist_rows=len(hist),
                         segments=len(segs), bins=n_bins,
                         ffd_s=round(ffd_s, 2)))
    RESULTS["ffd_packer"] = rows


def study_b(spark):
    print("\n## B. serving-order wall vs corpus fanout\n")
    print("| mult | docs | serve_s |")
    print("|---|---|---|")
    rows = []
    for mult in (1, 4, 16, 64):
        docs = _fanout_docs(spark, mult).persist()
        n = docs.count()
        docs.createOrReplaceTempView("documents")
        t0 = time.time()
        chat.serving_order(spark).count()
        serve_s = time.time() - t0
        docs.unpersist()
        print(f"| {mult}x | {n} | {serve_s:.2f} |")
        rows.append(dict(mult=mult, docs=n, serve_s=round(serve_s, 2)))
    RESULTS["serving_order"] = rows


def study_c(spark):
    print("\n## C. streaming quota: partial vs shard size, "
          "merge vs batch count\n")
    print("| mult | shard_docs | partial_s |")
    print("|---|---|---|")
    rows = []
    for mult in (1, 4, 16, 64):
        shard = _fanout_docs(spark, mult).select(
            "doc_id", "source"
        ).persist()
        n = shard.count()
        t0 = time.time()
        quotagate.quota_partial(shard).count()
        partial_s = time.time() - t0
        shard.unpersist()
        print(f"| {mult}x | {n} | {partial_s:.2f} |")
        rows.append(dict(mult=mult, shard_docs=n,
                         partial_s=round(partial_s, 2)))
    RESULTS["quota_partial"] = rows

    print("\n| n_batches | merged_rows | merge_s |")
    print("|---|---|---|")
    docs = catalog.load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source"
    )
    mrows = []
    for n_batches in (3, 12, 48):
        commits = os.path.join(
            matcache.scratch_dir("dbp_r12_study_"), "commits"
        )
        for b in range(n_batches):
            quotagate.quota_partial(
                docs.filter(F.col("doc_id") % n_batches == b)
            ).write.mode("overwrite").parquet(
                os.path.join(commits, f"batch_id={b}")
            )
        t0 = time.time()
        merged = quotagate.read_quota(spark, commits).count()
        merge_s = time.time() - t0
        print(f"| {n_batches} | {merged} | {merge_s:.2f} |")
        mrows.append(dict(n_batches=n_batches, merged_rows=merged,
                          merge_s=round(merge_s, 2)))
    RESULTS["quota_merge"] = mrows


def study_d(spark):
    print("\n## D. length-bias audit wall vs corpus fanout\n")
    print("| mult | docs | audit_s |")
    print("|---|---|---|")
    rows = []
    for mult in (1, 4, 16, 64):
        docs = _fanout_docs(spark, mult).persist()
        n = docs.count()
        docs.createOrReplaceTempView("documents")
        t0 = time.time()
        spark.sql(preference.LEN_BIAS_SPARK).count()
        audit_s = time.time() - t0
        docs.unpersist()
        print(f"| {mult}x | {n} | {audit_s:.2f} |")
        rows.append(dict(mult=mult, docs=n, audit_s=round(audit_s, 2)))
    RESULTS["length_bias"] = rows


def main():
    spark = get_spark("round12-study")
    study_a(spark)
    study_b(spark)
    study_c(spark)
    study_d(spark)
    print("\n" + json.dumps(RESULTS))


if __name__ == "__main__":
    main()
