"""End-to-end SFT data pipeline — the round-10/11 chat families
composed into one run (VERDICT r10 next #7):

    conversations JSONL publish → JSONL ingest → structure
    validation gate (quarantine) → turn-grain eval decontamination →
    turn dedup report → ChatML render + loss mask → sequence packing
    → published training snapshot (parquet) + one JSON metrics line

Usage:
    python examples/sft_pipeline.py [sf_dir] [out_dir]

Every stage is the SAME machinery the hash-gated driver queries run —
the example only rewires which ``documents`` view each stage sees, so
the gates upstream genuinely shrink the corpus the render/pack stages
consume. At 100 TB the posture is unchanged: the validation and
decontam gates are one turns-chain pass each, dedup shuffles digests,
packing rides the exclusive prefix sum (no global windows).
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
    chat,
    chatvalidate,
    decontam,
)
from dataset_batch_processor_spark.operators.textops import (  # noqa: E402
    exclusive_prefix_sum,
)
from dataset_batch_processor_spark.session import get_spark  # noqa: E402
from dataset_batch_processor_spark.sources.jsonl import read_jsonl  # noqa: E402


def run(spark, sf_dir: str, out_dir: str) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    metrics: dict = {}

    # 0. publish conversation shards as JSONL (the wire format SFT
    #    corpora actually arrive in), then INGEST from that artifact —
    #    everything downstream sees only the JSONL.
    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    jsonl_dir = os.path.join(out_dir, "conversations_jsonl")
    chat.conversations_df(spark).write.mode("errorifexists").json(jsonl_dir)
    conv = read_jsonl(spark, jsonl_dir, chat.CHAT_CONV_SCHEMA)
    metrics["n_conversations_in"] = conv.count()

    # rebuild the (doc_id, text) relation from the ingested turns:
    # turns partition the single-spaced token stream in order, so the
    # ordered content join reproduces it and the seeded turn chain
    # re-derives identically (pinned in tests/test_sft_example.py).
    conv.select(
        "doc_id",
        F.expr(
            "array_join(transform(turns, t -> t.content), ' ')"
        ).alias("text"),
    ).createOrReplaceTempView("documents")

    # 1. structure validation gate: quarantine broken conversations
    verdicts = spark.sql(chatvalidate.CHAT_VALIDATE_SPARK).persist()
    metrics["validate_reasons"] = {
        r["reason"]: r["n_convs"]
        for r in spark.sql(
            chatvalidate.CHAT_VALIDATE_COUNTS_SPARK
        ).collect()
    }
    keep_ids = verdicts.filter("decision = 'keep'").select("doc_id")

    # 2. turn-grain eval decontamination: drop conversations whose
    #    user turns collide with the benchmark panel's 8-grams
    leaks = (
        spark.sql(decontam.CHAT_DECONTAM_SPARK)
        .select("doc_id").distinct()
    )
    metrics["n_decontam_hits"] = leaks.count()

    clean = (
        spark.table("documents")
        .join(keep_ids, "doc_id", "semi")
        .join(leaks, "doc_id", "anti")
        .persist()
    )
    metrics["n_conversations_clean"] = clean.count()
    clean.createOrReplaceTempView("documents")

    # 3. turn dedup report over the surviving corpus (the boilerplate-
    #    reply audit; the admission variant streams, see
    #    streaming/turndedup.py)
    dup = spark.sql(chat.CHAT_TURN_DEDUP_SPARK)
    metrics["n_dup_turn_groups"] = dup.count()

    # 4. ChatML render + loss mask
    rendered = spark.sql(chat.CHAT_RENDER_SPARK)
    masks = spark.sql(chat.CHAT_LOSS_MASK_SPARK)
    metrics["mask_chars_total"] = int(
        masks.agg(F.sum("mask_chars")).collect()[0][0]
    )

    # 5. pack into fixed token-budget sequences (exclusive prefix sum
    #    — the _q_chat_pack_sequences body over the FILTERED view)
    lens = spark.sql(chat.CHAT_DOC_LENS_SPARK)
    exclusive_prefix_sum(
        lens, ["doc_id"], "doc_len", "s"
    ).createOrReplaceTempView("doc_offs")
    spark.sql(chat.CHAT_TURN_SPANS_SPARK).createOrReplaceTempView(
        "turn_spans"
    )
    packed = spark.sql("WITH _x AS (SELECT 1)" + chat._pack_tail("spark"))

    # 6. publish the training snapshot
    rendered.write.mode("errorifexists").parquet(
        os.path.join(out_dir, "rendered")
    )
    packed.write.mode("errorifexists").parquet(
        os.path.join(out_dir, "packed")
    )
    metrics["n_sequences"] = packed.count()
    metrics["tokens_packed"] = int(
        packed.agg(F.sum("tokens_used")).collect()[0][0]
    )
    return metrics


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="sft_pipeline_")
    )
    spark = get_spark("sft-pipeline-example")
    print(json.dumps({"out_dir": out_dir, **run(spark, sf_dir, out_dir)}))


if __name__ == "__main__":
    main()
