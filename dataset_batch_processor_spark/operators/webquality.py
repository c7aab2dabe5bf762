"""Gopher-style document quality rules (Rae et al. 2021, public).

The rule family every web-scale curation pipeline applies before
anything model-based: cheap, interpretable per-document statistics
with thresholds. Expressed entirely in JVM expressions (split +
higher-order folds, including the top-word share as a per-row
sorted-run-length scan since round 15 — ZERO shuffles) — no Python,
no corpus-wide state, embarrassingly parallel at any scale. Thresholds are adapted to the synthetic fixture's scale
(its docs are shorter than web pages) but keep the published rule
STRUCTURE: word-count bounds, mean-word-length band, stopword
presence, top-word dominance.

Determinism: all ratios are integer fixed-point (×1000 / ppm via
integer DIV) — no float division anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog

STOPWORDS = ("the", "a", "of", "and", "in")
MIN_WORDS = 20
MEAN_LEN_LO_X1000 = 2_000
MEAN_LEN_HI_X1000 = 10_000
TOP_WORD_MAX_PPM = 200_000  # most frequent word may own <= 20%
MIN_STOPWORD_HITS = 2


def _top_word_scan():
    """(top_word, top_count) as ONE per-row fold: run-length scan of
    the ascending-sorted token array. Strict ``run > best`` keeps the
    FIRST word reaching the max count — in ascending order that is
    the lexicographically smallest, i.e. exactly the old
    ``ORDER BY c DESC, w ASC`` argmax. Round 15 (stream-family diet):
    the previous explode + groupBy(doc_id, w) + row_number window put
    two shuffles and a per-doc sort into EVERY gopher consumer —
    including each micro-batch of the streaming quality twin; the
    scan is whole-stage-codegen JVM work, linear after the per-row
    sort, and at 100 TB removes the n_words-fold row blowup
    entirely."""
    def step(acc, x):
        new_run = (
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
        )
        better = new_run > acc["best"]
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.when(better, new_run).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["best_w"]).alias("best_w"),
        )

    return F.aggregate(
        F.array_sort("ws"),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
            F.lit(None).cast("string").alias("best_w"),
        ),
        step,
        lambda acc: F.struct(
            acc["best_w"].alias("top_word"),
            acc["best"].alias("top_count"),
        ),
    )


def gopher_quality(docs: DataFrame) -> DataFrame:
    words = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("ws")
    ).select(
        "doc_id",
        F.size("ws").alias("n_words"),
        F.aggregate(
            F.transform("ws", lambda w: F.length(w)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("word_chars"),
        F.array_distinct(
            F.filter("ws", lambda w: w.isin(*STOPWORDS))
        ).alias("stop_set"),
        _top_word_scan().alias("top"),
    )
    out = words.select(
        "doc_id",
        "n_words",
        F.expr("word_chars * 1000 DIV n_words").alias("mean_len_x1000"),
        F.size("stop_set").cast("int").alias("stopword_hits"),
        F.col("top.top_word").alias("top_word"),
        F.expr("top.top_count * 1000000 DIV n_words").alias(
            "top_word_ppm"
        ),
    )
    return out.select(
        "*",
        (
            (F.col("n_words") >= MIN_WORDS)
            & (F.col("mean_len_x1000") >= MEAN_LEN_LO_X1000)
            & (F.col("mean_len_x1000") <= MEAN_LEN_HI_X1000)
            & (F.col("stopword_hits") >= MIN_STOPWORD_HITS)
            & (F.col("top_word_ppm") <= TOP_WORD_MAX_PPM)
        ).alias("passes_gopher"),
    ).orderBy("doc_id")


def _q_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_quality(catalog.load_table(spark, sf_dir, "documents"))


_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)

# The tokenization + top-word CTE chain, exported so composing
# oracles (the curation funnel) share the EXACT SQL rather than a
# copy that could drift when the token definition changes.
GOPHER_CHAIN_DUCK = f"""ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
base AS (
  SELECT doc_id,
         len(w) AS n_words,
         CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT)
           AS word_chars,
         CAST(len(list_distinct(list_filter(w,
              x -> x IN ({_STOP_LIST})))) AS INT) AS stopword_hits
  FROM ws
),
counts AS (
  SELECT doc_id, u.w AS word, count(*) AS c
  FROM ws, unnest(ws.w) AS u(w)
  GROUP BY doc_id, u.w
),
top AS (
  SELECT doc_id, word AS top_word, c AS top_count
  FROM (
    SELECT doc_id, word, c,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY c DESC, word ASC) AS rn
    FROM counts
  ) WHERE rn = 1
)"""

#: the pass predicate over the chain's ``base b`` / ``top t`` aliases,
#: exported like GOPHER_CHAIN_DUCK so composing oracles (keep-best,
#: token-budget fill) share the EXACT SQL text rather than a copy
#: that could drift from a threshold change.
GOPHER_PASS_PRED_DUCK = f"""(b.n_words >= {MIN_WORDS}
        AND b.word_chars * 1000 // b.n_words >= {MEAN_LEN_LO_X1000}
        AND b.word_chars * 1000 // b.n_words <= {MEAN_LEN_HI_X1000}
        AND b.stopword_hits >= {MIN_STOPWORD_HITS}
        AND t.top_count * 1000000 // b.n_words <= {TOP_WORD_MAX_PPM})"""

GOPHER_DUCK = f"""
WITH {GOPHER_CHAIN_DUCK}
SELECT b.doc_id,
       CAST(b.n_words AS INT) AS n_words,
       CAST(b.word_chars * 1000 // b.n_words AS BIGINT) AS mean_len_x1000,
       b.stopword_hits,
       t.top_word,
       CAST(t.top_count * 1000000 // b.n_words AS BIGINT) AS top_word_ppm,
       {GOPHER_PASS_PRED_DUCK}
         AS passes_gopher
FROM base b JOIN top t ON b.doc_id = t.doc_id
ORDER BY b.doc_id
"""

QUERIES = {"docs_gopher_quality": _q_gopher}
ORACLES = {"docs_gopher_quality": GOPHER_DUCK}


# ------------------------------------------- per-language fertility
# Tokenizer-fertility style corpus profile: tokens and characters per
# language, with integer-ppm tokens-per-100-chars — the number that
# drives per-language sampling budgets (a language whose tokenizer
# fragments text 2x costs 2x the context window per character). One
# map-side-combined aggregation over a narrow projection.


def lang_fertility(docs: DataFrame) -> DataFrame:
    return (
        docs.select(
            "lang",
            (F.size(F.split(F.col("text"), " "))).alias("toks"),
            F.length("text").alias("chars"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("bigint").alias("n_tokens"),
            F.sum("chars").cast("bigint").alias("n_chars"),
        )
        .select(
            "lang", "n_docs", "n_tokens", "n_chars",
            F.expr("n_tokens * 100000000 DIV n_chars").alias(
                "tokens_per_100_chars_x1e6"
            ),
        )
        .orderBy("lang")
    )


def _q_lang_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_fertility(catalog.load_table(spark, sf_dir, "documents"))


LANG_FERTILITY_DUCK = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(sum(len(text)) AS BIGINT) AS n_chars,
       CAST(sum(len(string_split(text, ' '))) * 100000000
            // sum(len(text)) AS BIGINT) AS tokens_per_100_chars_x1e6
FROM documents
GROUP BY lang
ORDER BY lang
"""

QUERIES["docs_lang_fertility"] = _q_lang_fertility
ORACLES["docs_lang_fertility"] = LANG_FERTILITY_DUCK


# ------------------------------------------------- blocklist filter
# The C4-style blocklist rule (Raffel et al. 2020 drop pages hitting
# a word blocklist; most production pipelines keep a variant): count
# token-exact blocklist hits per document and flag. The LIST here is
# a placeholder drawn from the fixture vocabulary so the rule
# demonstrably fires — the STRUCTURE (token-exact match, count,
# binary flag, share of corpus flagged) is the operator. Pure narrow
# array expressions; no shuffle, no Python.

BLOCKWORDS = ("slow", "big", "hash")


def blocklist_filter(docs: DataFrame) -> DataFrame:
    # NO orderBy here: composed pipelines (the streaming gate, the
    # web example) join this straight into keyed work — a baked-in
    # global sort would add a corpus-wide range exchange nobody
    # consumes (review round 8). The gated query sorts for itself.
    ws = F.split(F.col("text"), " ")
    hits = F.size(F.filter(ws, lambda w: w.isin(*BLOCKWORDS)))
    return docs.select(
        "doc_id",
        hits.cast("int").alias("n_hits"),
        (hits > 0).alias("flagged"),
    )


def _q_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return blocklist_filter(
        catalog.load_table(spark, sf_dir, "documents")
    ).orderBy("doc_id")


_BLOCK_LIST = ", ".join(f"'{w}'" for w in BLOCKWORDS)

BLOCKLIST_DUCK = f"""
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '),
            w -> w IN ({_BLOCK_LIST}))) AS INT) AS n_hits,
       len(list_filter(string_split(text, ' '),
            w -> w IN ({_BLOCK_LIST}))) > 0 AS flagged
FROM documents
ORDER BY doc_id
"""

QUERIES["docs_blocklist_filter"] = _q_blocklist
ORACLES["docs_blocklist_filter"] = BLOCKLIST_DUCK
