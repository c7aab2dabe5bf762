"""Round-13 scale studies.

A) production-hash MinHash signature build (VERDICT r12 missing #3 /
   next #6): md5-substr-conv base hash vs xxhash64, wall clock of the
   full K-perm signature aggregation at 1/4/16/64x the sf0.1
   documents corpus. Pair-recall parity is pinned separately in
   tests/test_dedup_production_hash.py; this measures the speedup the
   escape hatch buys on the hottest corpus pass.

B) round-12 family growth curves (VERDICT r12 next #8):
   docs_canary_exposure, docs_stream_passk, docs_stream_margin_hist
   at 1/4/16/64x fanout of the documents table. The streaming twins
   are measured through their REAL availableNow drain over a staged
   fanout corpus (fresh staging per mult — the fixture is the corpus
   under test, not the session-shared artifact).

Usage: python tools/round13_scale_study.py [A|B] (default: both)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from studylib import fanout_table  # noqa: E402

from dataset_batch_processor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULTS = (1, 4, 16, 64)


def study_a(spark) -> None:
    from dataset_batch_processor_spark.operators import dedup

    # warm the session (codegen + shuffle paths) so mult=1 doesn't
    # absorb JVM start-up into the md5 column
    warm = fanout_table(spark, SF_DIR, "documents", "doc_id", 1)
    dedup.minhash_signatures_df(warm).count()
    dedup.minhash_signatures_df(warm, production_hash=True).count()
    print("## A: signature build md5 vs xxhash64 (sf0.1 documents)")
    print("| mult | n_docs | md5 s | xxhash64 s | speedup |")
    print("|---|---|---|---|---|")
    for mult in MULTS:
        docs = fanout_table(spark, SF_DIR, "documents", "doc_id", mult)
        n = docs.count()
        t0 = time.time()
        dedup.minhash_signatures_df(docs).count()
        md5_s = time.time() - t0
        t0 = time.time()
        dedup.minhash_signatures_df(docs, production_hash=True).count()
        xx_s = time.time() - t0
        print(
            f"| {mult} | {n} | {md5_s:.2f} | {xx_s:.2f} "
            f"| {md5_s / xx_s:.2f}x |",
            flush=True,
        )


def _stage_fanout(spark, docs, tag: str, n_shards: int = 3) -> str:
    from dataset_batch_processor_spark.matcache import scratch_dir
    from pyspark.sql import functions as F

    stage = scratch_dir(f"dbp_r13_{tag}_")
    for part in range(n_shards):
        docs.filter(F.col("doc_id") % n_shards == part).coalesce(
            1
        ).write.mode("append").parquet(stage)
    return stage


def study_b(spark) -> None:
    from dataset_batch_processor_spark.matcache import scratch_dir
    from dataset_batch_processor_spark.operators import canary
    from dataset_batch_processor_spark.streaming import prefgate, rlvrgate

    print("## B: round-12 family growth (canary + streaming twins)")
    print("| mult | n_docs | canary_exposure s | stream_passk s "
          "| stream_margin_hist s |")
    print("|---|---|---|---|---|")
    for mult in MULTS:
        docs = fanout_table(spark, SF_DIR, "documents", "doc_id", mult)
        n = docs.count()
        # canary exposure: batch chain over a fanout view
        t0 = time.time()
        docs.createOrReplaceTempView("documents")
        spark.sql(canary.EXPOSURE_SPARK).count()
        canary_s = time.time() - t0
        spark.catalog.dropTempView("documents")
        # streaming twins over freshly staged fanout shards
        sub = docs.select("doc_id", "text")
        stage = _stage_fanout(spark, sub, f"rvg{mult}")
        work = scratch_dir(f"dbp_r13_rvgw{mult}_")
        t0 = time.time()
        q = rlvrgate.accumulate_grades(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(stage),
            commits_dir=os.path.join(work, "commits"),
            checkpoint_dir=os.path.join(work, "ckpt"),
        )
        q.awaitTermination()
        rlvrgate.read_passk(spark, os.path.join(work, "commits")).count()
        passk_s = time.time() - t0
        stage = _stage_fanout(spark, sub, f"pfg{mult}")
        work = scratch_dir(f"dbp_r13_pfgw{mult}_")
        t0 = time.time()
        q = prefgate.accumulate_margins(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(stage),
            commits_dir=os.path.join(work, "commits"),
            checkpoint_dir=os.path.join(work, "ckpt"),
        )
        q.awaitTermination()
        prefgate.read_margins(spark, os.path.join(work, "commits")).count()
        margin_s = time.time() - t0
        print(
            f"| {mult} | {n} | {canary_s:.2f} | {passk_s:.2f} "
            f"| {margin_s:.2f} |",
            flush=True,
        )


# --------------------------------------------------------- study C
# Growth curves for every round-13 gated query, run UNMODIFIED: the
# fanout corpus is materialized as a scratch sf-dir (documents.parquet
# + embeddings.parquet with remapped unique ids), so each query's own
# loader, matcache keys, and plan are exactly the gated ones.

def _fanout_sf_dir(spark, mult: int) -> str:
    from dataset_batch_processor_spark.matcache import scratch_dir

    d = scratch_dir(f"dbp_r13_sf_{mult}_")
    fanout_table(spark, SF_DIR, "documents", "doc_id", mult)\
        .write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    fanout_table(spark, SF_DIR, "embeddings", "vec_id", mult)\
        .write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    return d


def study_c(spark) -> None:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [
        "docs_padded_batch_plan",
        "docs_source_length_outliers",
        "docs_rollout_diversity",
        "docs_hll_distinct_tokens",
        "docs_fuzzy_decontam",
        "docs_embed_feathash",
        "docs_embed_ann_topk",
        "docs_mixture_interleave",
        "docs_embed_ann_lsh_topk",
        "docs_stream_canary_card",
        "docs_stream_hll_card",
        "emb_ivf_cluster_card",   # capped at 16x: lattice k ~ n/31,
                                  # 64x trains a 10k-centroid GEMM
    ]
    print("## C: round-13 query growth (fanout sf-dirs, queries unmodified)")
    print("| mult | n_docs | " + " | ".join(n.replace("docs_", "")
                                            for n in names) + " |")
    print("|" + "---|" * (len(names) + 2))
    for mult in MULTS:
        d = _fanout_sf_dir(spark, mult)
        n = spark.read.parquet(os.path.join(d, "documents.parquet")).count()
        cells = []
        for name in names:
            # emb_ivf_cluster_card: lattice k ~ n/31 makes the
            # assignment GEMM n*k ~ n^2/31 at the fixture config
            # (production k ~ sqrt(n)); docs_embed_ann_topk: the
            # query panel grows with the corpus, so the exact brute
            # force is TH(n^2/50) BY DEFINITION (422 s measured at
            # 16x) — both capped, the caps ARE the measured finding
            if name in ("emb_ivf_cluster_card",
                        "docs_embed_ann_topk") and mult > 16:
                cells.append("(capped)")
                continue
            if name == "docs_embed_ann_topk" and mult > 4:
                cells.append("(422.05 prior run)")
                continue
            t0 = time.time()
            qs[name](spark, d).count()
            cells.append(f"{time.time() - t0:.2f}")
            spark.catalog.clearCache()
        print(f"| {mult} | {n} | " + " | ".join(cells) + " |", flush=True)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "AB"
    spark = get_spark("round13-scale-study")
    if "A" in which:
        study_a(spark)
    if "B" in which:
        study_b(spark)
    if "C" in which:
        study_c(spark)


if __name__ == "__main__":
    main()
