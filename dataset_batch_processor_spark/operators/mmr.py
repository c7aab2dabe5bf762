"""MMR diversified top-k re-ranking (Carbonell & Goldstein 1998,
"The Use of MMR, Diversity-Based Reranking").

Relevance-only top-k (similarity.py) hands a RAG or dedup-aware
retrieval stack k near-identical passages when the corpus carries
near-duplicates; Maximal Marginal Relevance re-ranks a bounded
candidate pool so each pick trades relevance against similarity to
what is already selected:

    pick_t = argmax_{d not selected} [ lambda*rel(q,d)
                                       - (1-lambda)*max_{s in S} sim(d,s) ]

Exact-integer instantiation (hash-gate contract): every cosine goes
through the house round-6 convention (vector.cosine / cosine6_duck —
the ONE definition rule) and is quantized ``floor(x*1e6 + 0.5)`` to
int64, so the greedy argmax and every reported margin are exact
integer comparisons. ``lambda = 0.5`` hard-coded: argmax of
``0.5*(rel - maxsim)`` equals argmax of ``rel - maxsim``, so the
scale factor drops out and the trajectory stays integer.

Structure: candidates = exact top-``CAND_N`` per panel query (the
gated brute-force machinery); pairwise candidate similarity is a
bounded CAND_N^2-per-query self-join; selection is MMR_K unrolled
greedy rounds — each round one join + one per-query argmax window.
The Spark side unrolls the same rounds as DataFrame ops; the DuckDB
oracle replays them as materialized CTEs (the DoReMi/BT convention).

Scale posture: the broadcast panel x corpus scan is the same cost as
the gated brute-force baseline; everything after it operates on
panel_size * CAND_N rows (candidate pools, not the corpus) — at
100 TB the pool join is broadcast-sized by construction, and the
MMR rounds never touch the corpus again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import catalog
from ..functions import vector
from .similarity import QUERY_MOD, cosine6_duck

CAND_N = 12   # relevance candidate pool per query
MMR_K = 5     # diversified picks per query


def _q6(col):
    """floor(round6(cos)*1e6 + 0.5) — exact int64 cosine (the
    determinism-rules quantization convention)."""
    return F.floor(F.round(col, 6) * F.lit(1000000.0) + F.lit(0.5)).cast(
        "long"
    )


def mmr_topk(
    emb: DataFrame, k: int = MMR_K, cand_n: int = CAND_N,
    query_mod: int = QUERY_MOD,
) -> DataFrame:
    """(query_id, mmr_rank, neighbor_id, rel_q6, penalty_q6, mmr_q6)
    — the greedy MMR selection over the exact top-``cand_n`` pool."""
    queries = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _q6(vector.cosine(F.col("q_emb"), F.col("embedding"))).alias(
                "rel_q6"
            ),
        )
    )
    w_rel = Window.partitionBy("query_id").orderBy(
        F.desc("rel_q6"), F.col("neighbor_id")
    )
    cand = (
        scored.withColumn("rn", F.row_number().over(w_rel))
        .filter(F.col("rn") <= cand_n)
        .drop("rn")
        .persist()
    )
    # pairwise candidate similarity — CAND_N^2 per query, bounded
    ce = cand.join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("n_emb"),
        ),
        "neighbor_id",
    )
    a = ce.select("query_id", F.col("neighbor_id").alias("i"),
                  F.col("n_emb").alias("i_emb"))
    b = ce.select("query_id", F.col("neighbor_id").alias("j"),
                  F.col("n_emb").alias("j_emb"))
    cpairs = (
        a.join(b, "query_id")
        .filter(F.col("i") != F.col("j"))
        .select(
            "query_id", "i", "j",
            _q6(vector.cosine(F.col("i_emb"), F.col("j_emb"))).alias(
                "sim_q6"
            ),
        )
        .persist()
    )
    picked = (
        cand.withColumn("rn", F.row_number().over(w_rel))
        .filter(F.col("rn") == 1)
        .select(
            "query_id", "neighbor_id", "rel_q6",
            F.lit(0).cast("long").alias("penalty_q6"),
            F.lit(1).cast("int").alias("mmr_rank"),
        )
    )
    cp = cpairs.select(
        F.col("query_id").alias("p_q"), F.col("i").alias("p_i"),
        F.col("j").alias("p_j"), "sim_q6",
    )
    for t in range(2, k + 1):
        # disambiguated aliases: cand/cpairs/picked share lineage, so
        # bare column refs in the round-t joins are ambiguous
        sel = picked.select(
            F.col("query_id").alias("s_q"),
            F.col("neighbor_id").alias("s_j"),
        )
        remaining = cand.join(
            picked.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"], "left_anti",
        ).select(
            F.col("query_id").alias("r_q"),
            F.col("neighbor_id").alias("r_n"),
            F.col("rel_q6").alias("r_rel"),
        )
        pen = (
            remaining.join(
                cp, (F.col("p_q") == F.col("r_q"))
                & (F.col("p_i") == F.col("r_n"))
            )
            .join(sel, (F.col("s_q") == F.col("p_q"))
                  & (F.col("s_j") == F.col("p_j")))
            .groupBy("r_q", "r_n", "r_rel")
            .agg(F.max("sim_q6").alias("penalty_q6"))
        )
        w_mmr = Window.partitionBy("r_q").orderBy(
            F.desc(F.col("r_rel") - F.col("penalty_q6")),
            F.col("r_n"),
        )
        pick_t = (
            pen.withColumn("rn", F.row_number().over(w_mmr))
            .filter(F.col("rn") == 1)
            .select(
                F.col("r_q").alias("query_id"),
                F.col("r_n").alias("neighbor_id"),
                F.col("r_rel").alias("rel_q6"),
                "penalty_q6",
                F.lit(t).cast("int").alias("mmr_rank"),
            )
        )
        picked = picked.unionByName(pick_t)
    return picked.select(
        "query_id",
        "mmr_rank",
        "neighbor_id",
        "rel_q6",
        "penalty_q6",
        (F.col("rel_q6") - F.col("penalty_q6")).cast("long").alias("mmr_q6"),
    ).orderBy("query_id", "mmr_rank")


def _q_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mmr_topk(catalog.load_table(spark, sf_dir, "embeddings"))


def _cos_q6_duck(x: str, y: str) -> str:
    return (
        f"CAST(floor({cosine6_duck(x, y)} * 1000000 + 0.5) AS BIGINT)"
    )


def _mmr_duck(k: int = MMR_K, cand_n: int = CAND_N) -> str:
    parts = [
        f"""queries AS (
  SELECT vec_id AS query_id, embedding AS q_emb
  FROM embeddings WHERE vec_id % {QUERY_MOD} = 0
),
scored AS MATERIALIZED (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_cos_q6_duck('q.q_emb', 'e.embedding')} AS rel_q6
  FROM embeddings e, queries q
  WHERE e.vec_id <> q.query_id
),
cand AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel_q6 FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel_q6 DESC, neighbor_id) AS rn
    FROM scored
  ) WHERE rn <= {cand_n}
),
cpairs AS MATERIALIZED (
  SELECT a.query_id, a.neighbor_id AS i, b.neighbor_id AS j,
         {_cos_q6_duck('ea.embedding', 'eb.embedding')} AS sim_q6
  FROM cand a
       JOIN cand b ON a.query_id = b.query_id
                  AND a.neighbor_id <> b.neighbor_id
       JOIN embeddings ea ON ea.vec_id = a.neighbor_id
       JOIN embeddings eb ON eb.vec_id = b.neighbor_id
),
all1 AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel_q6,
         CAST(0 AS BIGINT) AS penalty_q6, 1 AS mmr_rank
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel_q6 DESC, neighbor_id) AS rn
    FROM cand
  ) WHERE rn = 1
)"""
    ]
    for t in range(2, k + 1):
        parts.append(
            f"""
s{t} AS MATERIALIZED (
  SELECT c.query_id, c.neighbor_id, c.rel_q6,
         CAST(max(p.sim_q6) AS BIGINT) AS penalty_q6
  FROM cand c
       JOIN cpairs p ON p.query_id = c.query_id
                    AND p.i = c.neighbor_id
       JOIN all{t - 1} s ON s.query_id = p.query_id
                        AND s.neighbor_id = p.j
  WHERE NOT EXISTS (SELECT 1 FROM all{t - 1} x
                    WHERE x.query_id = c.query_id
                      AND x.neighbor_id = c.neighbor_id)
  GROUP BY c.query_id, c.neighbor_id, c.rel_q6
),
p{t} AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel_q6, penalty_q6, {t} AS mmr_rank
  FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id
        ORDER BY rel_q6 - penalty_q6 DESC, neighbor_id) AS rn
    FROM s{t}
  ) WHERE rn = 1
),
all{t} AS MATERIALIZED (
  SELECT * FROM all{t - 1} UNION ALL SELECT * FROM p{t}
)"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
SELECT query_id, CAST(mmr_rank AS INT) AS mmr_rank, neighbor_id,
       rel_q6, penalty_q6,
       CAST(rel_q6 - penalty_q6 AS BIGINT) AS mmr_q6
FROM all{k}
ORDER BY query_id, mmr_rank
"""
    )


MMR_TOPK_DUCK = _mmr_duck()

QUERIES = {"emb_mmr_topk": _q_mmr_topk}
ORACLES = {"emb_mmr_topk": MMR_TOPK_DUCK}
