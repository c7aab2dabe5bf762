"""Per-source data card — the Datasheets-for-Datasets report (Gebru
et al. 2021) a training-data owner publishes per corpus slice, built
entirely from the engine's own gated signals: volume (docs, tokens,
chars), exact-duplicate rate, Gopher quality pass rate, and the
majority language. One row per source; this is the summary table a
mixture decision (doremi.py), a curation sweep (curationfunnel.py),
or an external data audit starts from.

Composition rule (the perceptron.py precedent): the quality signal is
NOT re-derived — the Spark side calls webquality.gopher_quality
verbatim and the oracle splices GOPHER_CHAIN_DUCK +
GOPHER_PASS_PRED_DUCK, so the card can never drift from the gated
gate it summarizes.

Scale: one scan computing per-doc scalars, three source-keyed
map-side-combined groupBys (sources × langs is a tiny key space),
the gopher chain's own per-doc aggregations, and a broadcast-sized
join of the rollups. All shares are integer trunc divisions in ppm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog
from .webquality import GOPHER_CHAIN_DUCK, GOPHER_PASS_PRED_DUCK, gopher_quality

# Shared tail over ``tok`` (per-doc scalars) and ``gq``
# (doc_id, passes_gopher). card_base avoids the gopher chain's own
# ``base`` CTE name.
_CARD_TAIL = """
, dupg AS (
  SELECT source, md5(text) AS tmd5, count(*) AS cnt
  FROM documents GROUP BY source, md5(text)
),
dups AS (
  SELECT source, CAST(sum(cnt - 1) AS BIGINT) AS n_dup_docs
  FROM dupg GROUP BY source
),
langs AS (
  SELECT source, lang,
         row_number() OVER (PARTITION BY source
                            ORDER BY count(*) DESC, lang) AS rn
  FROM documents GROUP BY source, lang
),
card_base AS (
  SELECT t.source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(t.n_toks) AS BIGINT) AS n_tokens,
         CAST(sum(t.n_chars) AS BIGINT) AS n_chars,
         CAST(sum(CASE WHEN g.passes_gopher THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass
  FROM tok t JOIN gq g ON t.doc_id = g.doc_id
  GROUP BY t.source
)
SELECT b.source, b.n_docs, b.n_tokens, b.n_chars,
       CAST(d.n_dup_docs * 1000000 {div} b.n_docs AS BIGINT) AS dup_ppm,
       CAST(b.n_pass * 1000000 {div} b.n_docs AS BIGINT)
           AS gopher_pass_ppm,
       l.lang AS majority_lang
FROM card_base b
     JOIN dups d ON b.source = d.source
     JOIN langs l ON b.source = l.source AND l.rn = 1
"""

_TOK_CTE = """tok AS (
  SELECT doc_id, source, lang, n_chars,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_toks
  FROM documents
)"""

DATA_CARD_SPARK = (
    f"WITH {_TOK_CTE}" + _CARD_TAIL.format(div="DIV")
)

DATA_CARD_DUCK = (
    f"""WITH {_TOK_CTE},
{GOPHER_CHAIN_DUCK},
gq AS (
  SELECT b.doc_id, {GOPHER_PASS_PRED_DUCK} AS passes_gopher
  FROM base b JOIN top t ON b.doc_id = t.doc_id
)"""
    + _CARD_TAIL.format(div="//")
)


def _q_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    gopher_quality(docs).select(
        "doc_id", "passes_gopher"
    ).createOrReplaceTempView("gq")
    return spark.sql(DATA_CARD_SPARK)


QUERIES = {"docs_data_card": _q_data_card}
ORACLES = {"docs_data_card": DATA_CARD_DUCK}
