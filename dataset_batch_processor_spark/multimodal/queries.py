"""Oracle-checked multimodal query: proves the Arrow/mapInPandas
plumbing against a pure-SQL oracle.

The ``documents`` fixture has no binary column, so the query
manufactures one (utf-8 bytes of the text) and runs a DETERMINISTIC
fake decoder in a real mapInPandas kernel: the "decoded" dimensions
are pure functions of the byte length. The DuckDB oracle computes the
same functions from ``length(text)`` (the corpus is ascii, so
byte length == char length) — if the Arrow batch plumbing drops,
reorders, duplicates, or corrupts rows, the hash comparison catches
it. This is the strongest driver-visible check available for the
Python kernel path while real codecs are stubbed.
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
        for pdf in batches:
            out = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(content)
                n = len(b)
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "n_bytes": n,
                        "fake_width": n % 100 + 1,
                        "fake_height": n // 100 + 1,
                        "checksum": int(sum(b)),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_bytes", "fake_width", "fake_height", "checksum"],
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

QUERIES = {"mm_decode_meta": _q_decode_meta}
ORACLES = {"mm_decode_meta": DECODE_META_DUCK}
