"""Matryoshka embedding truncation report (Kusupati et al. 2022,
"Matryoshka Representation Learning").

MRL-trained encoders let a pipeline serve ANN from a PREFIX of the
embedding — 8 of 64 dims costs 8× less memory/bandwidth — if the
truncated ranking stays close to the full-dimension ranking. This
report measures exactly that trade on the corpus: for each dim tier,
exact top-k retrieval over the tier's prefix vs the full-dim top-k,
reported as overlap@k — the number that decides which tier a serving
config can drop to.

Reuses the gated brute-force machinery verbatim (similarity.py's
query panel, JVM sequential cosine fold, cosine6_duck single
definition) with ``slice()``/list-prefix bounds as the only change —
so a tier at D=64 is BY CONSTRUCTION the gated emb_cosine_topk
ranking (identity pinned in tests).

Scale: each tier is the same broadcast-panel scan the brute-force
baseline costs; T tiers = T scans of the panel join (at 100 TB the
panel is the sampled-QA run, similarity.py:1246 posture). Overlap is
an exact integer join count; the ppm share is one trunc division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import catalog
from ..functions import vector
from .similarity import (
    DIM,
    PANEL_TAIL_SQL,
    QUERY_MOD,
    TOP_K,
    bounded_panel,
    cosine6_duck,
)

MRL_TIERS = (8, 16, 32, 64)


def _q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE panel scan computes every tier's cosine (T scalar folds
    over slice() prefixes — all whole-stage codegen); per-tier ranks
    are windows over the SAME query_id partitioning (one exchange, T
    sorts); overlap@k is a conditional aggregate — no per-tier rescan,
    no join. Measured (round 10, sf0.1 warm): the naive T+1-scan
    version 5.9 s -> this single-scan version 4.1 s; a "clever" fused
    single fold with a struct accumulator checkpointing each tier was
    tried and MEASURED SLOWER (5.6 s) — struct-accumulator aggregates
    fall out of whole-stage codegen, while four independent scalar
    folds stay in it (the round-9 OPH lesson again: K cheap codegen
    expressions beat one interpreted smart one). The DuckDB oracle
    keeps the naive T-scan spelling — structural independence is what
    makes the hash agreement evidence."""
    emb = catalog.load_table(spark, sf_dir, "embeddings")
    queries = bounded_panel(emb, QUERY_MOD).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    pairs = emb.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        *[
            F.round(
                # r15: exact-sequence Arrow fold — bit-identical
                vector.cosine_exact_arrow()(
                    F.slice("q_emb", 1, d), F.slice("embedding", 1, d)
                ),
                6,
            ).alias(f"c{d}")
            for d in MRL_TIERS
        ],
    )
    ranked = scored
    for d in MRL_TIERS:
        w = Window.partitionBy("query_id").orderBy(
            F.desc(f"c{d}"), F.col("neighbor_id")
        )
        ranked = ranked.withColumn(f"r{d}", F.row_number().over(w))
    full_r = f"r{DIM}"
    agg = ranked.agg(
        F.countDistinct("query_id").alias("nq"),
        *[
            # coalesce: Spark's ungrouped sum over ZERO input rows is
            # NULL (DuckDB's ungrouped count(*) twin is 0) — without
            # it the degenerate-corpus row would be NULL-vs-0 split
            # (round-11 review finding #1)
            F.coalesce(
                F.sum(
                    (
                        (F.col(f"r{d}") <= TOP_K)
                        & (F.col(full_r) <= TOP_K)
                    ).cast("long")
                ),
                F.lit(0),
            ).alias(f"o{d}")
            for d in MRL_TIERS
        ],
    )
    tiers = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("dim_tier"),
                F.col("nq").cast("long").alias("n_queries"),
                F.lit(TOP_K).cast("int").alias("k"),
                F.col(f"o{d}").cast("long").alias("total_overlap"),
                # greatest(nq,1): on an empty query panel Spark DIV
                # returns NULL while DuckDB // raises — guard BOTH
                # dialects identically (ADVICE r10). With the
                # coalesced overlap sums above, a degenerate corpus
                # yields one (dim, 0, k, 0, 0) row per tier on EACH
                # side — identical, never a split.
                F.expr(f"o{d} * 1000000 DIV (greatest(nq, 1) * {TOP_K})")
                .cast("long")
                .alias("overlap_ppm"),
            )
            for d in MRL_TIERS
        ]
    )
    return (
        agg.select(F.explode(tiers).alias("t"))
        .select("t.dim_tier", "t.n_queries", "t.k", "t.total_overlap",
                "t.overlap_ppm")
    )


def _cos_d(a: str, b: str, d: int) -> str:
    """cosine6_duck truncated to the first d list elements (via its
    dim parameter — no textual surgery)."""
    return cosine6_duck(a, b, d)


def _tier_duck(d: int) -> str:
    return f"""
SELECT query_id, neighbor_id
FROM (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_cos_d("q.q_emb", "e.embedding", d)} AS cos_sim
  FROM embeddings e,
       (SELECT vec_id AS query_id, embedding AS q_emb
        FROM embeddings WHERE vec_id % {QUERY_MOD} = 0 {PANEL_TAIL_SQL}) q
  WHERE e.vec_id <> q.query_id
)
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cos_sim DESC, neighbor_id) <= {TOP_K}
"""


def _matryoshka_duck() -> str:
    tiers = "\nUNION ALL\n".join(
        f"""SELECT CAST({d} AS INT) AS dim_tier,
       (SELECT CAST(count(DISTINCT query_id) AS BIGINT) FROM full_k)
           AS n_queries,
       CAST({TOP_K} AS INT) AS k,
       CAST(count(*) AS BIGINT) AS total_overlap,
       CAST(count(*) * 1000000 //
            (greatest((SELECT count(DISTINCT query_id) FROM full_k), 1)
             * {TOP_K})
            AS BIGINT) AS overlap_ppm
FROM ({_tier_duck(d)}) t
JOIN full_k f USING (query_id, neighbor_id)"""
        for d in MRL_TIERS
    )
    return f"""WITH full_k AS MATERIALIZED ({_tier_duck(DIM)})
{tiers}"""


QUERIES = {"emb_matryoshka_recall": _q_matryoshka_recall}
ORACLES = {"emb_matryoshka_recall": _matryoshka_duck()}
