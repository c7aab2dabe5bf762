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


# ------------------------------------------- SFT data card (round 11)
# The conversation-corpus datasheet: the pretraining card above
# summarizes raw documents; an SFT mixture decision needs the CHAT
# signals — validation keep rate (chatvalidate), duplicate-turn rate
# (chat's keyed chain), benchmark-leak rate (turn-grain decontam),
# and the assistant-content share of rendered chars (the loss-mask
# ratio a trainer budgets with). Same composition rule: every signal
# is the GATED chain spliced verbatim (Spark registers the gated
# queries as views; the oracle nests each family's full WITH as an
# independent subquery — DuckDB scopes CTEs per subquery, so the
# families' shared CTE names never collide).
#
# Scale: each signal is its own one-pass turns-chain scan (the gated
# queries' own posture); the card adds doc-keyed equi-joins and one
# source-keyed rollup. ppm products are int64-safe to ~9.2e12 total
# turns; past that, split the multiplication per the fertility
# exact-split precedent (bpe._ppm_split).

_SFT_CARD_TAIL = """
, perdoc AS (
  SELECT d.doc_id, d.source, v.decision, v.reason,
         k.n_turns, k.n_dup_turns, r.render_len,
         coalesce(m.mask_chars, 0) AS mask_chars,
         CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END AS leaked
  FROM documents d
       JOIN {v} v ON v.doc_id = d.doc_id
       JOIN {k} k ON k.doc_id = d.doc_id
       JOIN {r} r ON r.doc_id = d.doc_id
       LEFT JOIN {m} m ON m.doc_id = d.doc_id
       LEFT JOIN (SELECT DISTINCT doc_id FROM {lk}) l
              ON l.doc_id = d.doc_id
),
agg AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_convs,
         CAST(sum(n_turns) AS BIGINT) AS n_turns,
         CAST(sum(CASE WHEN decision = 'keep' THEN 1 ELSE 0 END)
              * 1000000 {div} count(*) AS BIGINT) AS keep_ppm,
         CAST(sum(n_dup_turns) * 1000000 {div} sum(n_turns) AS BIGINT)
             AS dup_turn_ppm,
         CAST(sum(leaked) * 1000000 {div} count(*) AS BIGINT)
             AS decontam_ppm,
         CAST(sum(mask_chars) * 1000000 {div} sum(render_len) AS BIGINT)
             AS mask_char_ppm
  FROM perdoc GROUP BY source
),
topr AS (
  SELECT source, reason,
         row_number() OVER (PARTITION BY source
                            ORDER BY count(*) DESC, reason) AS rn
  FROM perdoc WHERE decision = 'quarantine'
  GROUP BY source, reason
)
SELECT a.source, a.n_convs, a.n_turns, a.keep_ppm, a.dup_turn_ppm,
       a.decontam_ppm, a.mask_char_ppm,
       coalesce(t.reason, 'none') AS top_quarantine_reason
FROM agg a LEFT JOIN topr t ON a.source = t.source AND t.rn = 1
"""

SFT_CARD_SPARK = "WITH _x AS (SELECT 1)" + _SFT_CARD_TAIL.format(
    v="sft_verdicts", k="sft_dupdoc", r="sft_render", m="sft_mask",
    lk="sft_leaks", div="DIV",
)


def _sft_card_duck() -> str:
    from .chat import (
        CHAT_LOSS_MASK_DUCK,
        CHAT_RENDER_DUCK,
        CHAT_TURN_DUPDOC_DUCK,
    )
    from .chatvalidate import CHAT_VALIDATE_DUCK
    from .decontam import CHAT_DECONTAM_DUCK

    return "WITH _x AS (SELECT 1)" + _SFT_CARD_TAIL.format(
        v=f"({CHAT_VALIDATE_DUCK})",
        k=f"({CHAT_TURN_DUPDOC_DUCK})",
        r=f"({CHAT_RENDER_DUCK})",
        m=f"({CHAT_LOSS_MASK_DUCK})",
        lk=f"({CHAT_DECONTAM_DUCK})",
        div="//",
    )


def register_sft_card_views(spark: SparkSession) -> None:
    """Register the card's five component views from the CURRENT
    ``documents`` view (round-11 review #5: the scale study needs the
    same composition over a fanned-out view — one seam, no duplicated
    registration block that could silently measure a different card)."""
    from .chat import (
        CHAT_LOSS_MASK_SPARK,
        CHAT_RENDER_SPARK,
        CHAT_TURN_DUPDOC_SPARK,
    )
    from .chatvalidate import CHAT_VALIDATE_SPARK
    from .decontam import CHAT_DECONTAM_SPARK

    spark.sql(CHAT_VALIDATE_SPARK).createOrReplaceTempView("sft_verdicts")
    spark.sql(CHAT_TURN_DUPDOC_SPARK).createOrReplaceTempView("sft_dupdoc")
    spark.sql(CHAT_RENDER_SPARK).createOrReplaceTempView("sft_render")
    spark.sql(CHAT_LOSS_MASK_SPARK).createOrReplaceTempView("sft_mask")
    spark.sql(CHAT_DECONTAM_SPARK).createOrReplaceTempView("sft_leaks")


def _q_sft_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    register_sft_card_views(spark)
    return spark.sql(SFT_CARD_SPARK)


QUERIES = {
    "docs_data_card": _q_data_card,
    "docs_sft_data_card": _q_sft_data_card,
}
ORACLES = {
    "docs_data_card": DATA_CARD_DUCK,
    "docs_sft_data_card": _sft_card_duck(),
}
