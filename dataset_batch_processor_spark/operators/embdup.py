"""Embedding near-duplicate pairs: LSH-bucketed candidates verified
by exact cosine — the embedding analogue of MinHash→Jaccard
(dedup.py). Threshold 0.35 is calibrated to the synthetic corpus (max
pairwise cosine ≈ 0.51); real deployments use ~0.95 on purpose-built
embeddings. (Round 9: moved here from the former relational2 wave,
unchanged; components.py's near-dup component graph builds on the
same shared candidate base.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog

NEAR_DUP_T = 0.35


def _q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs = the shared candidate base filtered at the
    calibrated threshold. One construction of the LSH candidate set
    serves this query, the threshold histogram, and (through it) the
    near-dup component graph — the session-sharing convention every
    other pair-graph family follows."""
    from pyspark.sql import functions as F

    return _q_emb_near_dup_all(spark, sf_dir).filter(
        F.col("cos_sim") >= NEAR_DUP_T
    )


EMB_NEAR_DUP_DUCK = f"""
WITH planes AS (
  SELECT CAST(t AS INT) AS t, CAST(i AS INT) AS i,
         (CAST(concat('0x', substr(md5(concat(t, ':', i)), 1, 1)) AS INT) % 2) * 2 - 1
             AS sgn
  FROM (SELECT unnest(generate_series(0, 7)) AS t),
       (SELECT unnest(generate_series(1, 64)) AS i)
),
sigs AS (
  SELECT e.vec_id,
         CAST(sum(CASE WHEN proj > 0 THEN CAST(pow(2, t) AS INT) ELSE 0 END) AS INT)
             AS bucket
  FROM (
    SELECT e.vec_id, p.t,
           sum(CAST(e.embedding[p.i] AS DOUBLE) * p.sgn) AS proj
    FROM embeddings e, planes p
    GROUP BY e.vec_id, p.t
  ) e
  GROUP BY e.vec_id
),
bucketed AS (
  SELECT e.vec_id, e.embedding, s.bucket
  FROM embeddings e JOIN sigs s ON e.vec_id = s.vec_id
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.embedding AS emb_a, b.embedding AS emb_b
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
scored AS (
  SELECT vec_a, vec_b,
         round(
           list_sum(list_transform(generate_series(1, 64),
                    i -> CAST(emb_a[i] AS DOUBLE) * CAST(emb_b[i] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(generate_series(1, 64),
                    i -> CAST(emb_a[i] AS DOUBLE) * CAST(emb_a[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(generate_series(1, 64),
                    i -> CAST(emb_b[i] AS DOUBLE) * CAST(emb_b[i] AS DOUBLE))))),
           6) AS cos_sim
  FROM pairs
)
SELECT vec_a, vec_b, cos_sim FROM scored WHERE cos_sim >= {NEAR_DUP_T}
"""


# --------------------------------- near-dup threshold histogram
# The tuning table behind every "what EPS should I dedup at" decision:
# candidate-pair counts per cosine bin (0.05-wide), over the SAME
# LSH-bucketed candidate set the pair query uses — so the histogram
# reads directly as "how many pairs each threshold would remove".
# Bin arithmetic is floor(cos*20) on the ALREADY-ROUNDED cos_sim both
# engines share bit-identically, so bin edges cannot flake. 100-TB
# posture: identical to emb_near_dup_pairs (banded candidates, never
# all-pairs) plus one small-key aggregation.


def _q_emb_threshold_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    pairs = _q_emb_near_dup_all(spark, sf_dir)
    return (
        pairs.withColumn(
            "cos_bin",
            (F.floor(F.col("cos_sim") * 20) / 20).cast("double"),
        )
        .groupBy("cos_bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("cos_bin")
    )


def _q_emb_near_dup_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scored LSH candidate pairs WITHOUT the final threshold —
    the ONE physical construction behind the pair query
    (>= NEAR_DUP_T), the threshold histogram (all bins), and the
    component graph. Materialized once per session (matcache), so
    every consumer probes a scratch-parquet scan instead of re-running
    the bucket self-join — the same convention the dHash/pHash pair
    graphs follow. 100-TB posture: one banded self-join per session;
    the materialized result is candidate-pair-sized (banded, never
    all-pairs), and downstream filters/aggs prune on the scan."""
    from pyspark.sql import functions as F

    from ..functions import vector
    from ..matcache import materialize_once
    from .similarity import lsh_signature_exact_arrow

    def build() -> DataFrame:
        emb = catalog.load_table(spark, sf_dir, "embeddings")
        # r15: exact-fold-order Arrow signature — identical buckets
        b = emb.withColumn(
            "bucket", lsh_signature_exact_arrow()(F.col("embedding"))
        )
        left = b.select(
            F.col("vec_id").alias("vec_a"),
            F.col("embedding").alias("emb_a"),
            "bucket",
        )
        right = b.select(
            F.col("vec_id").alias("vec_b"),
            F.col("embedding").alias("emb_b"),
            F.col("bucket").alias("bucket_b"),
        )
        pairs = left.join(
            right,
            (F.col("bucket") == F.col("bucket_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        # r15: exact-sequence Arrow fold — bit-identical, vectorized
        cos = F.round(
            vector.cosine_exact_arrow()(F.col("emb_a"), F.col("emb_b")), 6
        )
        return pairs.select("vec_a", "vec_b", cos.alias("cos_sim"))

    return materialize_once(spark, "embnd_cands", sf_dir, build)


EMB_THRESHOLD_HIST_DUCK = (
    EMB_NEAR_DUP_DUCK.replace(
        f"SELECT vec_a, vec_b, cos_sim FROM scored "
        f"WHERE cos_sim >= {NEAR_DUP_T}",
        """SELECT CAST(floor(cos_sim * 20) / 20 AS DOUBLE) AS cos_bin,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM scored
GROUP BY 1
ORDER BY cos_bin""",
    )
)


QUERIES = {
    "emb_near_dup_pairs": _q_emb_near_dup,
    "emb_near_dup_threshold_hist": _q_emb_threshold_hist,
}

ORACLES = {
    "emb_near_dup_pairs": EMB_NEAR_DUP_DUCK,
    "emb_near_dup_threshold_hist": EMB_THRESHOLD_HIST_DUCK,
}
