"""Shared multimodal query plumbing: the Arrow-batch probe and the
id fan-out helper every codec-family query module builds on (split
out of multimodal/queries.py in round 10 — VERDICT r9 next #5, the
same thematic regroup the relational strata got in round 9).

``mm_decode_meta`` proves the mapInPandas plumbing itself against a
pure-SQL oracle: the "decoded" dimensions are pure functions of the
byte length, so any dropped/reordered/duplicated Arrow row breaks the
hash. ``_fanout`` is the doc_id repartition ahead of Python codec
kernels — the whole perf fix for kernel-bound families (13.2s -> 1.6s
at sf0.1), pinned in tests/test_plan_shape.py.
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog

DECODE_SCHEMA = "doc_id long, n_bytes int, fake_width int, fake_height int, checksum bigint"


def fake_decode_meta(binary_df: DataFrame) -> DataFrame:
    """mapInPandas kernel: deterministic dims + additive checksum from
    the payload bytes (the checksum touches every byte, so content
    corruption — not just length drift — would surface)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            blobs = pdf["content"].map(bytes)
            n = blobs.map(len).to_numpy(dtype=np.int64)
            # one Arrow-side concat + a single frombuffer/reduceat pass
            # (no per-row Python sum): additive checksum per blob
            joined = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            ends = np.cumsum(n)
            starts = ends - n
            # prefix-sum difference: exact per-blob sums, robust to
            # empty blobs anywhere in the batch
            csum = np.zeros(joined.size + 1, dtype=np.int64)
            np.cumsum(joined, out=csum[1:])
            sums = csum[ends] - csum[starts]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                    "n_bytes": n.astype(np.int32),
                    "fake_width": (n % 100 + 1).astype(np.int32),
                    "fake_height": (n // 100 + 1).astype(np.int32),
                    "checksum": sums,
                }
            )

    return binary_df.mapInPandas(run, schema=DECODE_SCHEMA)


def _q_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.load_table(spark, sf_dir, "documents")
    binary = docs.select("doc_id", F.encode("text", "utf-8").alias("content"))
    return fake_decode_meta(binary)


# ascii corpus: byte length == char length; checksum == sum of ascii
# codes, computable in SQL via the same posexplode-free char trick
DECODE_META_DUCK = """
WITH chars AS (
  SELECT doc_id, len(text) AS n,
         list_sum(list_transform(string_split(text, ''), c -> ascii(c))) AS cks
  FROM documents
)
SELECT doc_id,
       CAST(n AS INT) AS n_bytes,
       CAST(n % 100 + 1 AS INT) AS fake_width,
       CAST(n // 100 + 1 AS INT) AS fake_height,
       CAST(cks AS BIGINT) AS checksum
FROM chars
"""

def _fanout(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """doc_id-only fan-out ahead of a CPU-bound Python kernel.

    The documents scan is one small parquet file -> 1-2 input
    partitions, so without this every codec kernel below runs on one
    or two cores (mm_jpeg_roundtrip measured 13.2 s at sf0.1 that
    way). Repartitioning JUST the 8-byte ids costs a trivial shuffle
    and spreads the per-row encode/decode across all slots — the same
    shape a 1000-executor decode stage needs, where the scan
    parallelism (file count) and the kernel parallelism (CPU) are
    unrelated quantities."""
    return docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )


QUERIES = {
    "mm_decode_meta": _q_decode_meta,
}
ORACLES = {
    "mm_decode_meta": DECODE_META_DUCK,
}
