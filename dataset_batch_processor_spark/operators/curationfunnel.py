"""Curation funnel: stage-by-stage attrition across the corpus gates.

Extension surface (the reference has no corpus curation at all): the
dashboard every large-scale training-data pipeline keeps — how many
documents survive each gate, in pipeline order, and for each document
the FIRST gate that kills it. The gates compose the engine's existing
operators rather than re-deriving them, so the funnel cannot drift
from the per-gate queries:

1. ``length``  — n_words >= webquality.MIN_WORDS (the Gopher floor)
2. ``lang``    — textanalysis language-ID resolves (guess != 'und')
3. ``quality`` — the full composite Gopher rule set
4. ``dedup``   — exact-duplicate survivor (min doc_id per md5(text),
                 the dedup module's canonical-copy rule)
5. ``neardup`` — MinHash-LSH near-dup survivor (canonical = min
                 doc_id of the connected component, the same
                 session-materialized CC labels docs_dedup_survivors
                 consumes)

Attribution is first-fail in that order, so a document failing both
length and quality counts against ``length`` (the composite Gopher
flag embeds the length floor; the funnel's per-stage kill counts stay
disjoint by construction). Gates are independent predicates over the
full corpus — the near-dup graph is built corpus-wide, not over the
stage-4 survivors, matching how the standalone dedup queries define
victims.

100-TB posture: per-gate costs are the same as the underlying
queries (narrow scans + keyed aggs; the top-word window is per-doc
keyed); the funnel adds ONE extra join chain on doc_id — co-keyed,
no new shuffle shape — and a 4-row final aggregation. The
attribution output is corpus-sized but one row per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from .components import _PAIRS_AS_CTE, doc_dup_labels, victims_chain
from .textanalysis import LANG_CHAIN_DUCK, LANG_ID_SPARK, _LANG_BODY
from .webquality import (
    GOPHER_CHAIN_DUCK,
    MEAN_LEN_HI_X1000,
    MEAN_LEN_LO_X1000,
    MIN_STOPWORD_HITS,
    MIN_WORDS,
    TOP_WORD_MAX_PPM,
    gopher_quality,
)

GATES = ("length", "lang", "quality", "dedup", "neardup")


def doc_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document gate flags, one row per doc — each computed by
    the engine's own operator for that gate. Materialized once per
    session (matcache): the funnel, the attribution, and the
    threshold sweep all probe ONE gate table instead of each
    re-running the Gopher/lang/dedup chain — the same convention the
    pair graphs and CC labels follow."""
    from ..matcache import materialize_once

    return materialize_once(
        spark, "curation_gates", sf_dir,
        lambda: _build_doc_gates(spark, sf_dir),
    )


def _build_doc_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    # LEFT join: the lang-ID query has no row for documents with zero
    # non-empty tokens (whitespace-only text); the funnel must KEEP
    # such docs — they fail the lang gate ('und'), not vanish from
    # the corpus. gopher_quality covers every document (split() is
    # total), so it is the full-corpus spine.
    lang = spark.sql(LANG_ID_SPARK).select("doc_id", "lang_guess")
    gq = gopher_quality(docs).select(
        "doc_id", "n_words", F.col("passes_gopher").alias("gate_quality")
    )
    canon = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("canonical")
    )
    dd = (
        docs.select("doc_id", F.md5("text").alias("h"))
        .join(canon, "h")
        .select(
            "doc_id",
            (F.col("doc_id") == F.col("canonical")).alias("gate_dedup"),
        )
    )
    victims = (
        doc_dup_labels(spark, sf_dir)
        .filter(F.col("node") != F.col("comp"))
        .select(F.col("node").alias("doc_id"),
                F.lit(True).alias("_nd_victim"))
    )
    return (
        gq.join(lang, "doc_id", "left")
        .join(dd, "doc_id")
        .join(victims, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",  # kept so the threshold sweep needs no rescan
            (F.col("n_words") >= MIN_WORDS).alias("gate_length"),
            (F.coalesce(F.col("lang_guess"), F.lit("und")) != "und")
            .alias("gate_lang"),
            "gate_quality",
            "gate_dedup",
            F.col("_nd_victim").isNull().alias("gate_neardup"),
        )
    )


def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = doc_gates(spark, sf_dir)
    t = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("total"),
        F.sum(F.when(~F.col("gate_length"), 1).otherwise(0))
        .cast("bigint").alias("k1"),
        F.sum(
            F.when(F.col("gate_length") & ~F.col("gate_lang"), 1)
            .otherwise(0)
        ).cast("bigint").alias("k2"),
        F.sum(
            F.when(
                F.col("gate_length")
                & F.col("gate_lang")
                & ~F.col("gate_quality"),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("k3"),
        F.sum(
            F.when(
                F.col("gate_length")
                & F.col("gate_lang")
                & F.col("gate_quality")
                & ~F.col("gate_dedup"),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("k4"),
        F.sum(
            F.when(
                F.col("gate_length")
                & F.col("gate_lang")
                & F.col("gate_quality")
                & F.col("gate_dedup")
                & ~F.col("gate_neardup"),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("k5"),
    )
    return (
        t.selectExpr(
            """stack(5,
               1, 'length',  total,               k1,
               2, 'lang',    total-k1,            k2,
               3, 'quality', total-k1-k2,         k3,
               4, 'dedup',   total-k1-k2-k3,      k4,
               5, 'neardup', total-k1-k2-k3-k4,   k5
             ) AS (stage_idx, stage, n_in, n_killed)"""
        )
        .select(
            F.col("stage_idx").cast("int").alias("stage_idx"),
            "stage",
            F.col("n_in").cast("bigint").alias("n_in"),
            F.col("n_killed").cast("bigint").alias("n_killed"),
            (F.col("n_in") - F.col("n_killed")).cast("bigint").alias("n_out"),
        )
        .orderBy("stage_idx")
    )


def _q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = doc_gates(spark, sf_dir)
    first_fail = (
        F.when(~F.col("gate_length"), F.lit("length"))
        .when(~F.col("gate_lang"), F.lit("lang"))
        .when(~F.col("gate_quality"), F.lit("quality"))
        .when(~F.col("gate_dedup"), F.lit("dedup"))
        .when(~F.col("gate_neardup"), F.lit("neardup"))
        .otherwise(F.lit("pass"))
    )
    return g.select("doc_id", first_fail.alias("first_fail")).orderBy(
        "doc_id"
    )


# ----------------------------------------------------- DuckDB oracle
# One flat WITH chain re-deriving each gate from the SAME constants
# the per-gate oracles use (imported, not copied), so a threshold
# change flows into both engines and the per-gate queries at once.

# Every gate's SQL is the per-gate oracle's OWN chain, imported:
# components._PAIRS_AS_CTE + victims_chain (the LSH closure),
# textanalysis.LANG_CHAIN_DUCK (toks -> hits), and
# webquality.GOPHER_CHAIN_DUCK (ws -> base -> counts -> top) — a
# token-definition or canonical-rule change there flows into this
# oracle automatically. LEFT JOIN lang + coalesce('und') keeps
# zero-token documents in the corpus (they fail the lang gate, they
# don't vanish); base/top cover every document, so gopher is the
# full-corpus spine.
_GATES_DUCK = (
    _PAIRS_AS_CTE.removeprefix("WITH ")
    + ",\n"
    + victims_chain("nd_sym", "nd_reach", "nd_victims")
    + ",\n"
    + LANG_CHAIN_DUCK
    + f""",
lang AS ({_LANG_BODY}),
{GOPHER_CHAIN_DUCK},
gopher AS (
  SELECT b.doc_id, b.n_words,
         (b.n_words >= {MIN_WORDS}
          AND b.word_chars * 1000 // b.n_words >= {MEAN_LEN_LO_X1000}
          AND b.word_chars * 1000 // b.n_words <= {MEAN_LEN_HI_X1000}
          AND b.stopword_hits >= {MIN_STOPWORD_HITS}
          AND t.top_count * 1000000 // b.n_words <= {TOP_WORD_MAX_PPM})
           AS gate_quality
  FROM base b JOIN top t ON b.doc_id = t.doc_id
),
canon AS (
  SELECT md5(text) AS h, min(doc_id) AS canonical
  FROM documents GROUP BY 1
),
gates AS (
  SELECT g.doc_id,
         g.n_words,
         g.n_words >= {MIN_WORDS} AS gate_length,
         coalesce(l.lang_guess, 'und') <> 'und' AS gate_lang,
         g.gate_quality,
         d.doc_id = c.canonical AS gate_dedup,
         v.node IS NULL AS gate_neardup
  FROM gopher g
  LEFT JOIN lang l ON g.doc_id = l.doc_id
  JOIN documents d ON g.doc_id = d.doc_id
  JOIN canon c ON md5(d.text) = c.h
  LEFT JOIN nd_victims v ON g.doc_id = v.node
)
"""
)

FUNNEL_DUCK = f"""
WITH RECURSIVE {_GATES_DUCK},
k AS (
  SELECT CAST(count(*) AS BIGINT) AS total,
         CAST(sum(CASE WHEN NOT gate_length THEN 1 ELSE 0 END)
              AS BIGINT) AS k1,
         CAST(sum(CASE WHEN gate_length AND NOT gate_lang
                  THEN 1 ELSE 0 END) AS BIGINT) AS k2,
         CAST(sum(CASE WHEN gate_length AND gate_lang
                       AND NOT gate_quality THEN 1 ELSE 0 END)
              AS BIGINT) AS k3,
         CAST(sum(CASE WHEN gate_length AND gate_lang AND gate_quality
                       AND NOT gate_dedup THEN 1 ELSE 0 END)
              AS BIGINT) AS k4,
         CAST(sum(CASE WHEN gate_length AND gate_lang AND gate_quality
                       AND gate_dedup AND NOT gate_neardup
                  THEN 1 ELSE 0 END) AS BIGINT) AS k5
  FROM gates
)
SELECT CAST(1 AS INT) AS stage_idx, 'length' AS stage,
       total AS n_in, k1 AS n_killed, total - k1 AS n_out FROM k
UNION ALL
SELECT 2, 'lang', total - k1, k2, total - k1 - k2 FROM k
UNION ALL
SELECT 3, 'quality', total - k1 - k2, k3, total - k1 - k2 - k3 FROM k
UNION ALL
SELECT 4, 'dedup', total - k1 - k2 - k3, k4,
       total - k1 - k2 - k3 - k4 FROM k
UNION ALL
SELECT 5, 'neardup', total - k1 - k2 - k3 - k4, k5,
       total - k1 - k2 - k3 - k4 - k5 FROM k
ORDER BY stage_idx
"""

ATTRIBUTION_DUCK = f"""
WITH RECURSIVE {_GATES_DUCK}
SELECT doc_id,
       CASE WHEN NOT gate_length THEN 'length'
            WHEN NOT gate_lang THEN 'lang'
            WHEN NOT gate_quality THEN 'quality'
            WHEN NOT gate_dedup THEN 'dedup'
            WHEN NOT gate_neardup THEN 'neardup'
            ELSE 'pass' END AS first_fail
FROM gates
ORDER BY doc_id
"""

# ----------------------------------------- length-threshold sweep
# The tuning table behind "where should the length floor sit": for a
# grid of candidate MIN_WORDS values, how many docs the length gate
# alone keeps, and how many survive the WHOLE funnel with the floor
# moved there (all other gates at their production settings — the
# composite Gopher flag keeps its own floor, so the sweep isolates
# the standalone gate exactly like emb_near_dup_threshold_hist
# isolates the cosine threshold). One corpus scan + the shared gate
# table; 4 output rows.

SWEEP_MIN_WORDS = (10, 20, 40, 80)


def _q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # n_words is a column of the materialized gate table: the sweep
    # is one scan of that artifact, no documents rescan and no join
    j = doc_gates(spark, sf_dir)
    aggs = []
    for t in SWEEP_MIN_WORDS:
        aggs.append(
            F.sum(F.when(F.col("n_words") >= t, 1).otherwise(0))
            .cast("bigint").alias(f"len_{t}")
        )
        aggs.append(
            F.sum(
                F.when(
                    (F.col("n_words") >= t)
                    & F.col("gate_lang")
                    & F.col("gate_quality")
                    & F.col("gate_dedup")
                    & F.col("gate_neardup"),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias(f"all_{t}")
        )
    t1 = j.agg(*aggs)
    stack_args = ", ".join(
        f"{t}, len_{t}, all_{t}" for t in SWEEP_MIN_WORDS
    )
    return (
        t1.selectExpr(
            f"stack({len(SWEEP_MIN_WORDS)}, {stack_args}) "
            "AS (min_words, n_pass_length, n_pass_funnel)"
        )
        .select(
            F.col("min_words").cast("int").alias("min_words"),
            F.col("n_pass_length").cast("bigint").alias("n_pass_length"),
            F.col("n_pass_funnel").cast("bigint").alias("n_pass_funnel"),
        )
        .orderBy("min_words")
    )


_SWEEP_ROWS = "\nUNION ALL\n".join(
    f"""SELECT CAST({t} AS INT) AS min_words,
       (SELECT CAST(count(*) AS BIGINT) FROM gates
        WHERE n_words >= {t}) AS n_pass_length,
       (SELECT CAST(count(*) AS BIGINT) FROM gates
        WHERE n_words >= {t} AND gate_lang AND gate_quality
          AND gate_dedup AND gate_neardup) AS n_pass_funnel"""
    for t in SWEEP_MIN_WORDS
)

THRESHOLD_SWEEP_DUCK = f"""
WITH RECURSIVE {_GATES_DUCK}
{_SWEEP_ROWS}
ORDER BY min_words
"""

QUERIES = {
    "docs_curation_funnel": _q_funnel,
    "docs_funnel_attribution": _q_attribution,
    "docs_funnel_threshold_sweep": _q_threshold_sweep,
}
ORACLES = {
    "docs_curation_funnel": FUNNEL_DUCK,
    "docs_funnel_attribution": ATTRIBUTION_DUCK,
    "docs_funnel_threshold_sweep": THRESHOLD_SWEEP_DUCK,
}


# ---------------------------------------- gate agreement (round 9)
# Inter-gate agreement audit: pairwise Cohen's kappa between the five
# curation gates — the "are my quality signals redundant or
# complementary" question every multi-gate pipeline asks before
# adding a sixth. Exact arithmetic end to end: the 2x2 confusion per
# pair derives from integer counts (n11, per-gate totals, N), kappa's
# numerator/denominator are integer cross-products
# (N*(n11+n00) - (nA*nB + (N-nA)*(N-nB)) over N^2 - same), and the
# quantization is ALL-INTEGER truncating division (num*10^6 trunc-div
# den — Python's sign-adjusted //, DuckDB's HUGEINT //): no float
# ever, exact at ANY corpus size (n^2 exceeds int64 past ~3e9 docs,
# so the oracle casts to HUGEINT; the Spark side's Python ints are
# arbitrary-precision). A constant gate makes the denominator 0
# (kappa undefined); the row is emitted with degenerate=TRUE and
# kappa_ppm=0. One scan of the session-shared gate table collecting
# 16 ints (scalar-witness policy); the oracle reuses the funnel's
# gate CTE chain verbatim.

_GATE_COLS = (
    "gate_length", "gate_lang", "gate_quality", "gate_dedup",
    "gate_neardup",
)


def _trunc_div(a: int, b: int) -> int:
    """Truncate-toward-zero division (Python // floors; Spark DIV and
    DuckDB // truncate — the determinism-rules negative-dividend
    formula)."""
    return -((-a) // b) if a < 0 else a // b


def _q_gate_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = doc_gates(spark, sf_dir)
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [
        F.sum(F.col(c).cast("long")).alias(f"c_{c}") for c in _GATE_COLS
    ]
    for i, a in enumerate(_GATE_COLS):
        for b in _GATE_COLS[i + 1:]:
            aggs.append(
                F.sum((F.col(a) & F.col(b)).cast("long")).alias(f"c_{a}__{b}")
            )
    row = g.agg(*aggs).collect()[0]  # 16 ints, corpus-independent
    n = int(row["n"])
    out = []
    for i, a in enumerate(_GATE_COLS):
        for b in _GATE_COLS[i + 1:]:
            na, nb = int(row[f"c_{a}"]), int(row[f"c_{b}"])
            n11 = int(row[f"c_{a}__{b}"])
            n10, n01 = na - n11, nb - n11
            n00 = n - na - nb + n11
            chance = na * nb + (n - na) * (n - nb)
            num = n * (n11 + n00) - chance
            den = n * n - chance
            kappa = 0 if den == 0 else _trunc_div(num * 1_000_000, den)
            out.append((a, b, n11, n10, n01, n00, den == 0, kappa))
    return spark.createDataFrame(
        sorted(out),
        "gate_a STRING, gate_b STRING, n11 BIGINT, n10 BIGINT, "
        "n01 BIGINT, n00 BIGINT, degenerate BOOLEAN, kappa_ppm BIGINT",
    ).orderBy("gate_a", "gate_b")


def _agreement_duck() -> str:
    sums = ["CAST(count(*) AS BIGINT) AS n"]
    for c in _GATE_COLS:
        sums.append(
            f"CAST(sum(CASE WHEN {c} THEN 1 ELSE 0 END) AS BIGINT) AS c_{c}"
        )
    pair_rows = []
    for i, a in enumerate(_GATE_COLS):
        for b in _GATE_COLS[i + 1:]:
            sums.append(
                f"CAST(sum(CASE WHEN {a} AND {b} THEN 1 ELSE 0 END)"
                f" AS BIGINT) AS c_{a}__{b}"
            )
            pair_rows.append(f"""
  SELECT '{a}' AS gate_a, '{b}' AS gate_b,
         c_{a}__{b} AS n11,
         c_{a} - c_{a}__{b} AS n10,
         c_{b} - c_{a}__{b} AS n01,
         n - c_{a} - c_{b} + c_{a}__{b} AS n00,
         CAST(c_{a} AS HUGEINT) * c_{b}
           + (CAST(n AS HUGEINT) - c_{a}) * (n - c_{b}) AS chance,
         n
  FROM c""")
    union = "\n  UNION ALL".join(pair_rows)
    return f"""
WITH RECURSIVE {_GATES_DUCK},
c AS (SELECT {', '.join(sums)} FROM gates),
p AS ({union})
SELECT gate_a, gate_b,
       CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
       CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
       (CAST(n AS HUGEINT) * n - chance) = 0 AS degenerate,
       CAST(CASE WHEN CAST(n AS HUGEINT) * n - chance = 0 THEN 0
            ELSE (CAST(n AS HUGEINT) * (n11 + n00) - chance) * 1000000
                 // (CAST(n AS HUGEINT) * n - chance)
            END AS BIGINT) AS kappa_ppm
FROM p
ORDER BY gate_a, gate_b
"""


QUERIES["docs_gate_agreement"] = _q_gate_agreement
ORACLES["docs_gate_agreement"] = _agreement_duck()
