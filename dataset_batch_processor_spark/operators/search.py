"""Corpus keyword search: BM25-style ranked retrieval, Spark-first.

A training-data pipeline needs cheap corpus search (inspect dup
clusters, pull docs matching an eval probe, debug quality filters).
This is the batch formulation: score every document against a fixed
term set and take the global top-k.

Scoring = sum over query terms of tf(term, doc) * idf(term) with the
LINEAR idf surrogate (N - df + 0.5) / (df + 0.5) — the same
monotone-in-df replacement for log-idf the TF-IDF wave uses
(corpusstats.py): engine ln() differs in the last ulp between
Spark and DuckDB, a linear rational keeps ranking order AND hash
determinism. The three per-term products are added in one fixed
expression (not a SUM agg), so float association is identical on
both engines; round(6) seals it.

Scale shape:
- df per term: one corpus agg producing a 3-row frame -> broadcast
  (collected to literals here; a real deployment joins the broadcast).
- tf: map-side split+filter per row, no shuffle.
- top-k: orderBy+LIMIT compiles to TakeOrderedAndProject — per-
  partition heaps + driver merge of k rows, never a full sort.

Term counting uses whole-word equality on the space-split text (the
corpus is space-separated word soup — FIXTURES.md), not substring
matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog

QUERY_TERMS = ("spark", "window", "merge")
TOP_K = 20

_TF = {
    "spark": "size(filter(split(text, ' '), w -> w = '{t}'))",
    "duck": "len(list_filter(string_split(text, ' '), w -> w = '{t}'))",
}

_DF_CTE = {
    "spark": ", ".join(
        f"sum(CASE WHEN array_contains(split(text, ' '), '{t}') "
        f"THEN 1 ELSE 0 END) AS df_{i}"
        for i, t in enumerate(QUERY_TERMS)
    ),
    "duck": ", ".join(
        f"CAST(sum(CASE WHEN list_contains(string_split(text, ' '), '{t}') "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i, t in enumerate(QUERY_TERMS)
    ),
}


def _sql(dialect: str) -> str:
    tf_terms = [
        _TF[dialect].format(t=t) + f" AS tf_{i}"
        for i, t in enumerate(QUERY_TERMS)
    ]
    score = " + ".join(
        f"CAST(tf_{i} AS DOUBLE) * "
        f"((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5) "
        f"/ (CAST(df_{i} AS DOUBLE) + 0.5))"
        for i in range(len(QUERY_TERMS))
    )
    return f"""
WITH stats AS (
  SELECT count(*) AS n_docs, {_DF_CTE[dialect]}
  FROM documents
),
scored AS (
  SELECT doc_id, {", ".join(tf_terms)}
  FROM documents
)
SELECT doc_id,
       {", ".join(f"CAST(tf_{i} AS INT) AS tf_{i}" for i in range(len(QUERY_TERMS)))},
       CAST(round({score}, 6) AS DOUBLE) AS score
FROM scored CROSS JOIN stats
WHERE tf_0 + tf_1 + tf_2 > 0
ORDER BY score DESC, doc_id ASC
LIMIT {TOP_K}
"""


SEARCH_SPARK = _sql("spark")
SEARCH_DUCK = _sql("duck")


def _q_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(SEARCH_SPARK)


QUERIES = {"docs_keyword_search": _q_keyword_search}
ORACLES = {"docs_keyword_search": SEARCH_DUCK}
