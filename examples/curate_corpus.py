"""End-to-end corpus curation — the engine's LLM-data-pipeline
operators composed into one run:

    ingest → quality filter → exact dedup → near-dup (MinHash+LSH,
    Jaccard-verified) → repeated-span removal (substring dedup
    apply) → leakage-safe train/val split (cluster-keyed hash) →
    token-budget shards → partitioned parquet

Usage:
    python examples/curate_corpus.py [sf_dir] [out_dir]

Prints one JSON metrics line. Every stage is a declarative DataFrame
transformation from the operator library; at 100 TB the same code
runs with the shuffles analyzed in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from dataset_batch_processor_spark import catalog  # noqa: E402
from dataset_batch_processor_spark.operators import dedup, substring  # noqa: E402
from dataset_batch_processor_spark.session import get_spark  # noqa: E402

MIN_TOKENS = 30
MAX_STOPWORD_RATIO = 0.9
JACCARD_KILL = 0.8
TRAIN_PCT = 90
TOKENS_PER_SHARD = 20_000


def curate(spark, sf_dir: str, out_dir: str) -> dict:
    docs = catalog.load_table(spark, sf_dir, "documents")
    n_in = docs.count()

    # 1. quality filter: token count + stopword ratio (cheap, narrow)
    toks = F.split(F.col("text"), " ")
    sw = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to", "in", "is", "it")])
    with_q = docs.select(
        "doc_id",
        "text",
        "lang",
        F.size(toks).alias("n_tokens"),
        (
            F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
            / F.size(toks)
        ).alias("sw_ratio"),
    )
    # Each funnel stage below has MULTIPLE consumers (its count, the
    # next stage — which may read it twice, e.g. the dedup groupBy +
    # join — and the final split/shard/write chain). Persist each
    # stage once at the fan-out point or every consumer re-executes
    # the whole upstream lineage. On the tiny test fixture the gain
    # is modest (~10-20%: fixed job overhead dominates there); at
    # corpus scale the re-execution multiple is the whole cost.
    quality = with_q.filter(
        (F.col("n_tokens") >= MIN_TOKENS) & (F.col("sw_ratio") <= MAX_STOPWORD_RATIO)
    ).persist()
    n_quality = quality.count()

    # 2. exact dedup: keep the smallest doc_id per identical text
    canonical = (
        quality.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .join(quality, "doc_id")
        .drop("h")
    ).persist()
    n_exact = canonical.count()

    # 3. near-dup removal: LSH candidates verified by Jaccard; drop
    #    the higher doc_id of every confirmed near-dup pair
    near = (
        dedup.jaccard_verify_df(canonical.select("doc_id", "text"))
        .filter(F.col("jaccard") >= JACCARD_KILL)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = canonical.join(near, "doc_id", "left_anti").persist()
    n_near = kept.count()

    # 3b. repeated-span removal: cut every corpus-repeated substring
    #     (Lee et al.) from the surviving docs' text; token counts
    #     are re-derived from the cleaned text so the shard budgeting
    #     below sees the real residual volume
    kept.createOrReplaceTempView("documents")
    spans = (
        spark.sql(substring.SPANS_SPARK)
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("span_start", "span_end"))
            ).alias("spans")
        )
    )
    cut = F.expr(
        "aggregate(spans, struct(1L AS cur, '' AS acc), "
        "(st, sp) -> struct(sp.span_end + 1, "
        "concat(st.acc, substr(text, st.cur, sp.span_start - st.cur))), "
        "st -> concat(st.acc, substr(text, st.cur)))"
    )
    kept = (
        kept.join(spans, "doc_id", "left")
        .withColumn(
            "text", F.when(F.col("spans").isNull(), F.col("text")).otherwise(cut)
        )
        .drop("spans")
        .withColumn("n_tokens", F.size(F.split(F.col("text"), " ")))
    ).persist()

    # 4. LEAKAGE-SAFE hash-stable split + token-budget shards: the
    #    split hash keys on the near-dup CLUSTER canonical, not the
    #    doc id — survivors can still be similar below JACCARD_KILL,
    #    and doc-id hashing would put such a family on both sides of
    #    the train/val boundary (eval leakage; the rule
    #    docs_leakage_safe_split gates, applied here for real)
    from dataset_batch_processor_spark.operators.components import (
        connected_components,
    )

    # persisted: consumed by connected_components (iterative) AND the
    # cross-split leakage count below — without it the LSH candidate
    # chain re-executes for each
    pairs = dedup.lsh_pairs_df(kept.select("doc_id", "text")).persist()
    labels = connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), "comp"
    )
    kept = (
        kept.join(labels, "doc_id", "left")
        .withColumn("ckey", F.coalesce("comp", "doc_id"))
        .drop("comp")
    )
    hsplit = F.conv(
        F.substring(F.md5(F.col("ckey").cast("string")), 1, 15), 16, 10
    ).cast("long")
    # shard order still keys on the doc hash (uniform within splits)
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    split_col = F.when(hsplit % 100 < TRAIN_PCT, "train").otherwise("val")
    assigned = kept.withColumn("split", split_col).withColumn("h", h)
    cross_pairs = (
        pairs.join(
            assigned.select(F.col("doc_id").alias("doc_a"),
                            F.col("split").alias("split_a")), "doc_a")
        .join(
            assigned.select(F.col("doc_id").alias("doc_b"),
                            F.col("split").alias("split_b")), "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assigned = assigned.drop("ckey")
    from pyspark.sql import Window

    w = Window.partitionBy("split").orderBy("h", "doc_id")
    sharded = assigned.withColumn(
        "shard_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / TOKENS_PER_SHARD
        ).cast("long"),
    ).drop("h")

    # 5. write: split/shard partitioned layout
    sharded.write.partitionBy("split", "shard_id").mode("overwrite").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    per_split = {
        r["split"]: r["n"]
        for r in back.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    for df in (quality, canonical, kept, pairs):
        df.unpersist()
    return {
        "input_docs": n_in,
        "after_quality": n_quality,
        "after_exact_dedup": n_exact,
        "after_near_dedup": n_near,
        "chars_after_span_removal": int(
            back.agg(F.sum(F.length("text"))).first()[0]
        ),
        "train_docs": per_split.get("train", 0),
        "val_docs": per_split.get("val", 0),
        "cross_split_candidate_pairs": cross_pairs,  # 0 by the rule
        "n_shards": back.select("split", "shard_id").distinct().count(),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="curated_"
    ) + "/corpus"
    spark = get_spark("curate_corpus")
    print(json.dumps({"out": out_dir, **curate(spark, sf_dir, out_dir)}))


if __name__ == "__main__":
    main()
