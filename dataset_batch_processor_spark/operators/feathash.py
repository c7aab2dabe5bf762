"""Feature-hashed document embeddings (the hashing trick).

Weinberger et al., "Feature Hashing for Large Scale Multitask
Learning": map each token to a dimension ``h % D`` with sign
``(h div D) % 2`` and sum — a fixed-width bag-of-words embedding with
no vocabulary table, no training, and no driver state.  This is the
bridge from the ``documents`` table into the embedding toolchain
(ANN, PCA, semantic dedup, mining all operate on the output), and the
classic cheap baseline a 100 TB pipeline runs before paying for a
neural encoder.

Exact arithmetic throughout: the token hash bottoms out in md5
(functions/text.py house pattern), counts are integers, so each
component is an exact signed integer count — no floats, the driver
hash is stable by construction.  The registered query emits the
vector UNPIVOTED as (doc_id, dim, weight) rows: scale-friendly (the
groupBy key space is n_docs x D with map-side combine) and trivially
SQL-comparable; ``embed_df`` below re-assembles array<double>
columns for the downstream embedding operators.

At 100 TB: one narrow explode + one map-side-combined shuffle on
(doc_id, dim). No vocabulary broadcast, no join. Compare
corpusstats' TF-IDF (needs the document-frequency table): feature
hashing trades a controlled amount of collision noise for the total
absence of global state — why it is the scalable default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog

FH_DIM = 16

FH_SPARK = f"""
WITH toks AS (
  SELECT doc_id, token
  FROM (SELECT doc_id, explode(split(text, ' ')) AS token FROM documents)
  WHERE length(token) > 0
),
hashed AS (
  SELECT doc_id,
         CAST(h % {FH_DIM} AS INT) AS dim,
         CASE WHEN (h DIV {FH_DIM}) % 2 = 0 THEN 1 ELSE -1 END AS sign
  FROM (
    SELECT doc_id,
           CAST(conv(substr(md5(token), 1, 15), 16, 10) AS BIGINT) AS h
    FROM toks
  )
)
SELECT doc_id, dim, CAST(sum(sign) AS BIGINT) AS weight
FROM hashed
GROUP BY doc_id, dim
ORDER BY doc_id, dim
"""

FH_DUCK = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
toks2 AS (SELECT doc_id, token FROM toks WHERE length(token) > 0),
hashed AS (
  SELECT doc_id,
         CAST(h % {FH_DIM} AS INT) AS dim,
         CASE WHEN (h // {FH_DIM}) % 2 = 0 THEN 1 ELSE -1 END AS sign
  FROM (
    SELECT doc_id,
           CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT) AS h
    FROM toks2
  )
)
SELECT doc_id, dim, CAST(sum(sign) AS BIGINT) AS weight
FROM hashed
GROUP BY doc_id, dim
ORDER BY doc_id, dim
"""


def _q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(FH_SPARK)


def embed_df(docs: DataFrame, dim: int = FH_DIM) -> DataFrame:
    """(doc_id, embedding array<double>) — the dense form for the
    downstream embedding operators (ANN, PCA, semdedup). Densifies
    the unpivoted rows with a map-side-combined conditional-sum
    aggregation (one shuffle, same as the query path)."""
    toks = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        .filter(F.length("token") > 0)
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("token"), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .select(
            "doc_id",
            (F.col("h") % dim).cast("int").alias("dim"),
            # integer DIV, not `/`: h is up to 2^59 and a double
            # division would round above 2^53, corrupting the parity
            F.when(F.expr(f"(h DIV {dim}) % 2") == 0, 1)
            .otherwise(-1)
            .alias("sign"),
        )
    )
    aggs = [
        F.sum(F.when(F.col("dim") == d, F.col("sign")).otherwise(0))
        .cast("double")
        .alias(f"_d{d}")
        for d in range(dim)
    ]
    wide = toks.groupBy("doc_id").agg(*aggs)
    return wide.select(
        "doc_id",
        F.array(*[F.col(f"_d{d}") for d in range(dim)]).alias("embedding"),
    )


QUERIES = {"docs_feature_hash_embedding": _q_feature_hash}
ORACLES = {"docs_feature_hash_embedding": FH_DUCK}
