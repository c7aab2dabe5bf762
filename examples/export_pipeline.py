"""Training-data EXPORT pipeline: from curated corpus to the exact
token stream a trainer reads.

Picks up where dedup_pipeline.py stops (a clean, deduped corpus) and
runs the round-5 export stages the way a production pre-training prep
job would:

  1. score    — bigram-LM branching score (CCNet-style); drop the
                worst tail (highest mean branching = least fluent)
  2. embed    — feature-hashed BoW vectors; semantic near-dup pairs
                via cosine on the hashed vectors would slot in here
  3. shuffle  — epoch-seeded deterministic permutation (shard +
                sort key; windowless)
  4. pack     — token-level sequence packing at SEQ_LEN with EOS
                accounting (range-partitioned prefix sum)
  5. manifest — per-shard row: n_docs, n_units, first/last sequence
                — what the trainer's data loader consumes

Usage: python examples/export_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import curation, feathash, lmscore
from dataset_batch_processor_spark.session import get_spark


def export_plan(spark, sf_dir: str, drop_worst_pct: int = 10):
    docs = catalog.load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")

    # 1. LM-score every doc; keep all but the worst tail. The cutoff
    # is a corpus quantile — computed ONCE, broadcast as a scalar.
    scored = spark.sql(lmscore.BIGRAM_LM_SPARK)
    cut = scored.agg(
        F.expr(
            f"percentile_approx(mean_branching, {1 - drop_worst_pct / 100})"
        ).alias("cut")
    )
    kept = (
        scored.crossJoin(F.broadcast(cut))
        .filter(F.col("mean_branching") <= F.col("cut"))
        .select("doc_id")
    )

    # 2. hashed embeddings for the survivors (downstream ANN/semdedup
    # consume this table; materialized alongside the manifest)
    emb = feathash.embed_df(docs.join(kept, "doc_id"))

    # 3+4. epoch shuffle order drives token-level sequence packing —
    # over the FILTERED corpus: packing after the join would count the
    # dropped docs' tokens, leaving offset gaps in the stream the
    # trainer actually reads
    from dataset_batch_processor_spark.operators.textops import (
        exclusive_prefix_sum,
    )

    sized = docs.join(kept, "doc_id").select(
        "doc_id",
        (F.size(F.split("text", " ")) + 1).cast("bigint").alias("n_units"),
        F.expr(
            f"CAST(conv(substr(md5(concat('epoch{curation.EPOCH}:', "
            "CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        ).alias("k"),
    )
    packed = exclusive_prefix_sum(
        sized, ["k", "doc_id"], "n_units", out_col="tok_before"
    ).select(
        "doc_id",
        "n_units",
        "tok_before",
        F.floor(F.col("tok_before") / curation.SEQ_LEN)
        .cast("bigint")
        .alias("first_seq"),
        F.floor(
            (F.col("tok_before") + F.col("n_units") - 1) / curation.SEQ_LEN
        )
        .cast("bigint")
        .alias("last_seq"),
        (F.col("tok_before") % curation.SEQ_LEN).cast("int").alias(
            "offset_in_seq"
        ),
    )

    # 5. shard manifest: EPOCH_SHARDS-way split by first_seq
    manifest = (
        packed.withColumn(
            "shard", (F.col("first_seq") % curation.EPOCH_SHARDS).cast("int")
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_units").alias("n_units"),
            F.min("first_seq").alias("min_seq"),
            F.max("last_seq").alias("max_seq"),
        )
        .orderBy("shard")
    )
    return kept, emb, packed, manifest


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("export_pipeline")
    kept, emb, packed, manifest = export_plan(spark, sf_dir)
    print(f"kept docs:  {kept.count()}")
    print(f"embeddings: {emb.count()}")
    print(f"packed:     {packed.count()}")
    for r in manifest.collect():
        print(
            f"shard {r.shard}: {r.n_docs} docs, {r.n_units} units, "
            f"seqs [{r.min_seq}, {r.max_seq}]"
        )


if __name__ == "__main__":
    main()
