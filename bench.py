"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from dataset_batch_processor_spark.session import get_spark

# Headline set: the flagship + the heaviest of each operator family.
HEADLINE = (
    "tile_grid",
    "route_images",
    "caption_join",
    "dedup_lines",
    "split_chunks",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "q7_volume_shipping",
    "top_customers_per_nation",
    "events_hourly",
    "events_sessionize",
    "dedup_exact_docs",
    "minhash_lsh_pairs",
    "minhash_jaccard_verify",
    "simhash_signatures",
    "emb_cosine_topk",
    "emb_ivf_topk",
    "docs_quality_score",
    "docs_bpe_tokens",
    "docs_winnow_fingerprint",
    "asof_latest_order",
    "event_followups_within_hour",
    "docs_shard_packing",
    "q10_returned_items",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    # one warm-up action so JVM/codegen startup doesn't pollute q1
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()  # forces full execution without driver collect cost
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
