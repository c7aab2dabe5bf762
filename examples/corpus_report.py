"""Pre-mix corpus report: the one-page health check a training-data
pipeline prints before adding a source to the mixture.

Composes the round-4 stats surface into a single pass over the
documents + embeddings fixtures:

  1. per-source dataset card  (docs, chars, langs, exact-dup rate)
  2. vocabulary concentration (top-k token-mass coverage)
  3. near-subset duplicates   (containment over the shared pair graph)
  4. embedding norm histogram (collapsed/exploded embedding check)
  5. snapshot diff            (what changed since the last curation run)

Usage: python examples/corpus_report.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import (
    corpusstats,
    dataops,
    dedup,
    similarity,
)
from dataset_batch_processor_spark.session import get_spark


def report(spark, sf_dir: str) -> None:
    print("== per-source card ==")
    corpusstats.QUERIES["corpus_source_summary"](spark, sf_dir).show(
        5, truncate=False
    )

    print("== vocabulary concentration ==")
    corpusstats.QUERIES["docs_vocab_coverage"](spark, sf_dir).show(
        truncate=False
    )

    print("== near-subset duplicate pairs (containment >= 0.9) ==")
    docs = catalog.load_table(spark, sf_dir, "documents")
    cont = dedup.containment_verify_df(
        docs, pairs=dedup.pair_graph(spark, sf_dir)
    )
    cont.filter("is_subset_dup").orderBy("doc_a", "doc_b").show(10)

    print("== embedding norm histogram ==")
    similarity.QUERIES["emb_norm_histogram"](spark, sf_dir).show()

    print("== snapshot diff vs simulated re-crawl ==")
    diff = dataops.QUERIES["docs_snapshot_diff"](spark, sf_dir)
    diff.groupBy("status").count().orderBy("status").show()


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    report(get_spark("corpus_report"), sf)
