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

# any-term-matched filter, derived from the term list so QUERY_TERMS
# edits can't silently desync the WHERE clause from the tf columns
_ANY_TF = " + ".join(f"tf_{i}" for i in range(len(QUERY_TERMS))) + " > 0"

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
WHERE {_ANY_TF}
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


# ------------------------------------------------------------- BM25
# Full BM25 (Robertson/Sparck Jones, public formulation): the tf
# saturation and document-length normalization the linear-idf query
# above omits. score = sum_t idf_t * tf*(k1+1) / (tf + k1*(1-b+b*dl/
# avgdl)) with the same linear idf surrogate (engine ln() drift), all
# divisions double, one fixed-order expression, round(6) sealed.
# avgdl is computed as an exact integer token-count sum over the
# corpus divided as DOUBLE — identical in both engines.

BM25_K1 = 1.2
BM25_B = 0.75

_DL = {
    "spark": "size(split(text, ' '))",
    "duck": "len(string_split(text, ' '))",
}


def _bm25_sql(dialect: str) -> str:
    tf_terms = [
        _TF[dialect].format(t=t) + f" AS tf_{i}"
        for i, t in enumerate(QUERY_TERMS)
    ]
    norm = (
        f"{BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * CAST(dl AS DOUBLE) / avgdl)"
    )
    score = " + ".join(
        f"((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5) "
        f"/ (CAST(df_{i} AS DOUBLE) + 0.5)) "
        f"* (CAST(tf_{i} AS DOUBLE) * {BM25_K1 + 1.0}) "
        f"/ (CAST(tf_{i} AS DOUBLE) + {norm})"
        for i in range(len(QUERY_TERMS))
    )
    return f"""
WITH stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum({_DL[dialect]}) AS DOUBLE) / count(*) AS avgdl,
         {_DF_CTE[dialect]}
  FROM documents
),
scored AS (
  SELECT doc_id, {_DL[dialect]} AS dl, {", ".join(tf_terms)}
  FROM documents
)
SELECT doc_id,
       CAST(dl AS INT) AS dl,
       CAST(round({score}, 6) AS DOUBLE) AS bm25
FROM scored CROSS JOIN stats
WHERE {_ANY_TF}
ORDER BY bm25 DESC, doc_id ASC
LIMIT {TOP_K}
"""


BM25_SPARK = _bm25_sql("spark")
BM25_DUCK = _bm25_sql("duck")


def _q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(BM25_SPARK)


QUERIES = {
    "docs_keyword_search": _q_keyword_search,
    "docs_bm25_topk": _q_bm25,
}
ORACLES = {
    "docs_keyword_search": SEARCH_DUCK,
    "docs_bm25_topk": BM25_DUCK,
}
