"""Connected components over candidate-duplicate pairs — dup clusters.

The missing last step of the dedup family: LSH/Jaccard emit PAIRS,
but keep-one-per-cluster needs the transitive closure (doc A ~ B,
B ~ C => one cluster {A,B,C}). Implemented as iterative min-label
propagation on DataFrames:

- labels start as each node's own id;
- each round, every node takes min(own label, neighbors' labels) —
  one equi-join + one map-side-combine groupBy per round;
- converges in O(graph diameter) rounds. Near-dup clusters are
  star/clique-shaped (diameter 1-3), so 3-4 rounds in practice; the
  ``max_iters`` cap plus a changed-count action bound the loop.
- lineage is cut with localCheckpoint each round (an iterative
  algorithm's plan otherwise grows exponentially).

Scale ledger: per round, one shuffle of the (node, label) table on
node id and one of the edge list on the join key — both linear in
|E|; nothing driver-side except the scalar changed-count. For graphs
with giant diameter (not this workload) the two-phase large-star /
small-star scheme (Kiveris et al., "Connected Components in
MapReduce") halves round count; plain propagation is the right
trade for duplicate clusters.

Determinism: min-label over a fixed edge set is order-independent,
so the result is exactly reproducible and ORACLE-CHECKABLE — the
DuckDB side computes the same closure with a recursive CTE
(fixture-scale only; the recursive closure materializes O(cluster²)
rows and is no scale path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from .dedup import LSH_PAIRS_DUCK, lsh_pairs_df


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    max_iters: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component id =
    min node id in the component."""
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .union(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .distinct()
        .persist()
    )
    labels = sym.select("node").distinct().withColumn("comp", F.col("node"))
    labels = labels.localCheckpoint()
    # Convergence witness: labels only ever DECREASE under min-label
    # propagation, so sum(comp) strictly drops until the fixed point —
    # an O(1)-row aggregate replaces the join+count changed-row test,
    # and because the checkpoint is lazy, materializing the new label
    # table and computing the witness is ONE Spark job per iteration.
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
    for _ in range(max_iters):
        nbr_labels = (
            sym.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("comp").alias("cand")
                ),
                "nbr",
            ).select("node", "cand")
        )
        labels = (
            labels.select("node", F.col("comp").alias("cand"))
            .union(nbr_labels)
            .groupBy("node")
            .agg(F.min("cand").alias("comp"))
        ).localCheckpoint(eager=False)
        new_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    sym.unpersist()
    return labels


def _q_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup clusters from the MinHash-LSH candidate graph: every doc
    that appears in some candidate pair, labeled with its cluster's
    min doc_id."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    pairs = lsh_pairs_df(docs)
    return (
        connected_components(pairs, src="doc_a", dst="doc_b")
        .select("node", F.col("comp").alias("component"))
        .withColumnRenamed("node", "doc_id")
    )


# transitive closure via recursive CTE (fixture-scale oracle): reuse
# the LSH pair query's CTE chain, then close over it.
_PAIRS_AS_CTE = LSH_PAIRS_DUCK.replace(
    "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b",
    ",\npairs AS (\nSELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b",
).rstrip() + "\n)"

DUP_COMPONENTS_DUCK = (
    "WITH RECURSIVE "
    + _PAIRS_AS_CTE.removeprefix("WITH ")
    + """,
sym AS (
  SELECT doc_a AS node, doc_b AS nbr FROM pairs
  UNION
  SELECT doc_b AS node, doc_a AS nbr FROM pairs
),
reach(node, other) AS (
  SELECT node, nbr FROM sym
  UNION
  SELECT r.node, s.nbr FROM reach r JOIN sym s ON r.other = s.node
)
SELECT node AS doc_id, least(node, min(other)) AS component
FROM reach
GROUP BY node
"""
)

def dedup_survivors(docs: DataFrame, labels: DataFrame) -> DataFrame:
    """The dedup end-product: every doc EXCEPT non-canonical cluster
    members (canonical = min doc_id in the component). A broadcast-able
    anti join at any scale: the victim list is (cluster sizes - 1)
    rows, tiny relative to the corpus."""
    victims = labels.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("doc_id")
    )
    return docs.join(victims, "doc_id", "left_anti")


def _q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.load_table(spark, sf_dir, "documents")
    labels = connected_components(lsh_pairs_df(docs), src="doc_a", dst="doc_b")
    return dedup_survivors(docs.select("doc_id", "lang"), labels).orderBy(
        "doc_id"
    )


DEDUP_SURVIVORS_DUCK = (
    "WITH RECURSIVE "
    + _PAIRS_AS_CTE.removeprefix("WITH ")
    + """,
sym AS (
  SELECT doc_a AS node, doc_b AS nbr FROM pairs
  UNION
  SELECT doc_b AS node, doc_a AS nbr FROM pairs
),
reach(node, other) AS (
  SELECT node, nbr FROM sym
  UNION
  SELECT r.node, s.nbr FROM reach r JOIN sym s ON r.other = s.node
),
victims AS (
  SELECT node FROM reach GROUP BY node
  HAVING least(node, min(other)) <> node
)
SELECT doc_id, lang FROM documents
WHERE doc_id NOT IN (SELECT node FROM victims)
ORDER BY doc_id
"""
)

def _q_emb_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-dup clusters: connected components over the
    LSH-bucketed exact-cosine pair graph (relational2.emb_near_dup_pairs)
    — the vector-side mirror of docs_dup_components."""
    from .relational2 import _q_emb_near_dup

    pairs = _q_emb_near_dup(spark, sf_dir)
    labels = connected_components(pairs, src="vec_a", dst="vec_b")
    return labels.select(
        F.col("node").alias("vec_id"), F.col("comp").alias("component")
    ).orderBy("vec_id")


def _emb_pairs_cte() -> str:
    from .relational2 import EMB_NEAR_DUP_DUCK, NEAR_DUP_T

    final = f"SELECT vec_a, vec_b, cos_sim FROM scored WHERE cos_sim >= {NEAR_DUP_T}"
    assert final in EMB_NEAR_DUP_DUCK
    return EMB_NEAR_DUP_DUCK.replace("WITH planes", "WITH RECURSIVE planes").replace(
        final,
        f", ndpairs AS (SELECT vec_a, vec_b FROM scored WHERE cos_sim >= {NEAR_DUP_T})",
    )


def _emb_components_duck() -> str:
    return (
        _emb_pairs_cte()
        + """,
sym AS (
  SELECT vec_a AS node, vec_b AS nbr FROM ndpairs
  UNION
  SELECT vec_b AS node, vec_a AS nbr FROM ndpairs
),
reach(node, other) AS (
  SELECT node, nbr FROM sym
  UNION
  SELECT r.node, s.nbr FROM reach r JOIN sym s ON r.other = s.node
)
SELECT node AS vec_id, least(node, min(other)) AS component
FROM reach
GROUP BY node
ORDER BY vec_id
"""
    )


QUERIES = {
    "docs_dup_components": _q_dup_components,
    "docs_dedup_survivors": _q_dedup_survivors,
    "emb_near_dup_components": _q_emb_components,
}
ORACLES = {
    "docs_dup_components": DUP_COMPONENTS_DUCK,
    "docs_dedup_survivors": DEDUP_SURVIVORS_DUCK,
    "emb_near_dup_components": _emb_components_duck(),
}
