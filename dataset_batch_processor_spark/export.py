"""Training-data export planning: from curated corpus to the exact
token stream a trainer reads.

The packaged form of the flow `examples/export_pipeline.py`
demonstrates (the example imports from here — library code never
imports from examples/):

  1. score    — bigram-LM branching score (CCNet-style); drop the
                worst tail (highest mean branching = least fluent)
  2. embed    — feature-hashed BoW vectors for the survivors
  3. shuffle  — epoch-seeded deterministic permutation
  4. pack     — token-level sequence packing at SEQ_LEN with EOS
                accounting (range-partitioned prefix sum, run over
                the FILTERED corpus so the stream has no gaps)
  5. manifest — per-shard row: n_docs, n_units, first/last sequence

``pipeline.export_training_data`` publishes the results atomically
(sources/snapshots.py) with the manifest LAST, carrying the packed/
embeddings snapshot versions it describes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import catalog
from .operators import curation, dsir, feathash, lmscore
from .operators.textops import exclusive_prefix_sum


def export_plan(
    spark: SparkSession,
    sf_dir: str,
    drop_worst_pct: int = 10,
    selector: str = "lm",
):
    """Returns (kept, emb, packed, manifest) DataFrames. ``kept`` is
    persisted: every returned frame (and the caller's metrics count)
    shares the scored/filtered lineage, and without the persist the
    scoring + percentile cutoff — the dominant cost — would rerun
    once per downstream action.

    ``selector`` picks the quality signal for step 1:
    ``"lm"`` (default) drops the worst fluency tail by bigram-LM
    branching score; ``"dsir"`` keeps the most target-like tail by
    DSIR importance score (operators/dsir.py) — same cutoff-quantile
    mechanics, opposite polarity (high DSIR = keep)."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")

    # 1. score every doc; keep all but the worst tail. The cutoff
    # is a corpus quantile — computed ONCE, broadcast as a scalar.
    if selector == "lm":
        scored = spark.sql(lmscore.BIGRAM_LM_SPARK)
        cut = scored.agg(
            F.expr(
                f"percentile_approx(mean_branching, "
                f"{1 - drop_worst_pct / 100})"
            ).alias("cut")
        )
        keep_pred = F.col("mean_branching") <= F.col("cut")
    elif selector == "dsir":
        scored = dsir.dsir_scores(docs)
        cut = scored.agg(
            F.expr(
                f"percentile_approx(dsir_score_ppm, "
                f"{drop_worst_pct / 100})"
            ).alias("cut")
        )
        keep_pred = F.col("dsir_score_ppm") >= F.col("cut")
    else:
        raise ValueError(f"selector must be 'lm' or 'dsir', got {selector!r}")
    kept = (
        scored.crossJoin(F.broadcast(cut))
        .filter(keep_pred)
        .select("doc_id")
        .persist()
    )

    # 2. hashed embeddings for the survivors (downstream ANN/semdedup
    # consume this table; materialized alongside the manifest)
    emb = feathash.embed_df(docs.join(kept, "doc_id"))

    # 3+4. epoch shuffle order drives token-level sequence packing —
    # over the FILTERED corpus: packing the full corpus and joining
    # afterwards would count the dropped docs' tokens, leaving offset
    # gaps in the stream the trainer actually reads
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
