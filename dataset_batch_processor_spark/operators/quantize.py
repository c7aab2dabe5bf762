"""Embedding compression: per-dimension int8 scalar quantization.

The standard first step for shipping an ANN corpus at 100 TB scale:
4-byte floats -> 1-byte codes (4x smaller index, SIMD-friendly
distance kernels). Codebook = per-dimension (min, max) over the
corpus; code(v) = floor((v - min) * 255 / (max - min)), capped at
255. floor (not round) because Spark and DuckDB disagree on
round-half behavior while floor is identical IEEE on both.

Scale shape:
- codebook: posexplode + one 64-group agg — a per-dimension
  min/max is a map-side-combinable shuffle of 64 keys; result is
  dims x 16 bytes, broadcast to the coding join.
- coding: broadcast hash join (codebook side is KB), map-side
  arithmetic, one final agg by vec_id. No corpus-sized shuffle other
  than the vec_id agg, which a bucketed-by-vec_id layout removes.

The query emits integer code digests (sum/min/max per vector) so the
driver hash gate is exact: every code of every vector feeds the
result, float association never enters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog


def quantize_codes(emb: DataFrame) -> DataFrame:
    """(vec_id, pos, code int8-range) for every embedding element."""
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))
    dims = ex.groupBy("pos").agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    )
    code = (
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("v") - F.col("mn"))
                    * 255.0
                    / (F.col("mx") - F.col("mn"))
                ).cast("int"),
                F.lit(255),
            )
        )
        .alias("code")
    )
    return ex.join(F.broadcast(dims), "pos").select("vec_id", "pos", code)


def _q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = catalog.load_table(spark, sf_dir, "embeddings")
    return (
        quantize_codes(emb)
        .groupBy("vec_id")
        .agg(
            F.sum("code").alias("code_sum"),
            F.min("code").alias("code_min"),
            F.max("code").alias("code_max"),
        )
        .orderBy("vec_id")
    )


QUANTIZE_DUCK = """
WITH ex AS (
  SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings,
       (SELECT unnest(generate_series(
          1, (SELECT max(len(embedding)) FROM embeddings))) AS i) t
  WHERE i <= len(embedding)
),
dims AS (
  SELECT pos, min(v) AS mn, max(v) AS mx FROM ex GROUP BY pos
),
codes AS (
  SELECT vec_id,
         CASE WHEN mx = mn THEN 0
              ELSE least(CAST(floor((v - mn) * 255.0 / (mx - mn)) AS INT),
                         255)
         END AS code
  FROM ex JOIN dims USING (pos)
)
SELECT vec_id,
       CAST(sum(code) AS BIGINT) AS code_sum,
       CAST(min(code) AS INT) AS code_min,
       CAST(max(code) AS INT) AS code_max
FROM codes
GROUP BY vec_id
ORDER BY vec_id
"""

QUERIES = {"emb_quantize_int8": _q_quantize_int8}
ORACLES = {"emb_quantize_int8": QUANTIZE_DUCK}
