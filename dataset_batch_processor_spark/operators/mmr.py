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
bounded CAND_N^2-per-query self-join; the greedy selection runs on
the driver over ONE pool-bounded collect (see mmr_topk's measured
rejection of the all-DataFrame variant); the DuckDB oracle replays
the rounds as materialized CTEs (the DoReMi/BT convention).

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
    — the greedy MMR selection over the exact top-``cand_n`` pool.

    Split of labor (measured, round 11): the corpus-scale work — the
    broadcast-panel scan, the per-query pool window, and the pool's
    pairwise similarities — is distributed; the greedy selection then
    runs on the driver over ONE pool-bounded collect
    (panel x cand_n rel rows + panel x cand_n^2 sim rows — the
    doremi/BT k-row-witness policy; the panel is a fixed sampled set
    at any corpus scale, similarity.py's stance). A fully-distributed
    variant unrolling the MMR_K rounds as DataFrame joins was built
    first and MEASURED SLOWER ~4-13x (sf0.01 fixed-panel study:
    18-20 s flat at every fanout vs 5.8 s cold / 1.3-1.5 s warm here
    — the cost was Catalyst planning/execution of the 5-round
    union-of-joins plan, pure overhead at ANY data size since the
    rounds only touch pool-sized tables); rejected for the same
    reason the matryoshka fused fold was (clever plan shape, worse
    constant)."""
    queries = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _q6(
                # r15: exact-sequence Arrow fold — bit-identical
                vector.cosine_exact_arrow()(
                    F.col("q_emb"), F.col("embedding")
                )
            ).alias("rel_q6"),
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
            # pool-bounded (|Q| x cand_n^2 rows): JVM fold beats an
            # Arrow stage's fixed round-trip at this cardinality
            _q6(vector.cosine(F.col("i_emb"), F.col("j_emb"))).alias(
                "sim_q6"
            ),
        )
        .persist()
    )
    # pool-bounded collects (NOT corpus-sized): panel x cand_n rel
    # rows + panel x cand_n^2 sim rows
    rel: dict[int, dict[int, int]] = {}
    for r in cand.collect():
        rel.setdefault(r["query_id"], {})[r["neighbor_id"]] = int(
            r["rel_q6"]
        )
    sim: dict[tuple[int, int, int], int] = {}
    for r in cpairs.collect():
        sim[(r["query_id"], r["i"], r["j"])] = int(r["sim_q6"])
    cand.unpersist()
    cpairs.unpersist()

    rows: list[tuple[int, int, int, int, int, int]] = []
    for q in sorted(rel):
        pool = rel[q]
        first = min(pool, key=lambda n: (-pool[n], n))
        sel = [first]
        rows.append((q, 1, first, pool[first], 0, pool[first]))
        for t in range(2, min(k, len(pool)) + 1):
            best, best_key, best_pen = None, None, 0
            for n in pool:
                if n in sel:
                    continue
                pen = max(sim[(q, n, s)] for s in sel)
                key = (-(pool[n] - pen), n)
                if best_key is None or key < best_key:
                    best, best_key, best_pen = n, key, pen
            sel.append(best)
            rows.append(
                (q, t, best, pool[best], best_pen, pool[best] - best_pen)
            )
    return emb.sparkSession.createDataFrame(
        rows,
        "query_id BIGINT, mmr_rank INT, neighbor_id BIGINT, "
        "rel_q6 BIGINT, penalty_q6 BIGINT, mmr_q6 BIGINT",
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
