"""Quality-curriculum phase schedule: carve the corpus into training
phases of ascending quality, ending in the high-quality anneal slice.

The data-ordering step behind curriculum training (Bengio et al.
2009) as practiced for LLMs: recent open recipes end pretraining
with a decay/anneal phase over the highest-quality slice (publicly
documented in MiniCPM's WSD decay-phase data and Llama 3's
annealing; OLMo's staged mixes). This operator assigns every doc a
phase by quality rank — phase p holds ranks [p*n/P, (p+1)*n/P) under
(quality ASC, doc_id) — and gates the per-phase composition card a
run would be launched from: doc/token counts and the quality range
per phase, with phase P-1 the anneal slice.

Quality is the preference-family integer score (stopword density
dominating, type diversity breaking ranks — the exact-integer
spelling preference._chain gates), so ranking and the card are exact
integer arithmetic end to end. Ranks ride the W1 prefix sum on the
Spark side; the oracle keeps the one-level row_number spelling, so
the gate proves the distributed ranking reproduces the sequential
order. Phase boundaries are rank*P DIV n — balanced to within one
doc with no percentile estimation.

Scale: one token-stats aggregation, one rank, a P-row rollup.
sum_score <= n * 2e6 stays inside int64 to ~4e12 docs. Driver
traffic: zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from .textanalysis import _SW_LIST_SQL

N_PHASES = 4


def _scored_sql(engine: str) -> str:
    if engine == "spark":
        tok_x = "explode(split(text, ' '))"
        div = "DIV"
    else:
        tok_x = "unnest(string_split(text, ' '))"
        div = "//"
    return f"""toks AS (
  SELECT doc_id, token
  FROM (SELECT doc_id, {tok_x} AS token FROM documents)
  WHERE length(token) > 0
),
scored AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN token IN ({_SW_LIST_SQL})
                       THEN 1 ELSE 0 END) * 1000000 {div} count(*)
              + count(DISTINCT token) * 1000 {div} count(*)
              AS BIGINT) AS q
  FROM toks GROUP BY doc_id
)"""


_CARD_TAIL = """
SELECT CAST(phase AS INT) AS phase,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(min(q) AS BIGINT) AS min_score,
       CAST(max(q) AS BIGINT) AS max_score,
       CAST(sum(q) AS BIGINT) AS sum_score
FROM phased
GROUP BY phase
"""

CURRICULUM_DUCK = f"""
WITH {_scored_sql('duck')},
n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM scored),
phased AS (
  SELECT s.doc_id, s.n_tokens, s.q,
         (CAST(row_number() OVER (ORDER BY s.q, s.doc_id) - 1 AS BIGINT)
          * {N_PHASES}) // n.c AS phase
  FROM scored s CROSS JOIN n
){_CARD_TAIL}"""


def _q_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textops import exclusive_prefix_sum

    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    scored = spark.sql(f"WITH {_scored_sql('spark')} SELECT * FROM scored")
    ranked = exclusive_prefix_sum(
        scored.withColumn("_one", F.lit(1)), ["q", "doc_id"], "_one", "rnk"
    )
    total = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ranked.crossJoin(F.broadcast(total)).selectExpr(
        "doc_id", "n_tokens", "q",
        f"(rnk * {N_PHASES}) DIV c AS phase",
    ).createOrReplaceTempView("phased")
    return spark.sql("WITH _x AS (SELECT 1)" + _CARD_TAIL)


QUERIES = {"docs_curriculum_schedule": _q_curriculum}
ORACLES = {"docs_curriculum_schedule": CURRICULUM_DUCK}


# --------------------------------- epoch-anneal mixture schedule
# Mid-training practice shifts the SOURCE MIXTURE across epochs: start
# at the natural mix, end the run on the quality-weighted mix (the
# same decay-phase data shift the phase schedule above orders within
# one pass — MiniCPM WSD decay data, Llama-3 annealing, OLMo staged
# mixes). Per (epoch e, source): weight interpolates linearly,
#
#     w_e = ((E-1-e) * nat_ppm + e * qual_ppm) DIV (E-1)
#
# — all operands non-negative (no negative-division dialect hazard),
# nat/qual shares ride corpusstats._scaled_div (part-by-whole, int64-
# safe at any corpus size). qual share = each source's fraction of
# the corpus-total quality mass under the gated integer scorer.

N_EPOCHS = 4


def _anneal_sql(engine: str) -> str:
    from .corpusstats import _scaled_div

    div = "DIV" if engine == "spark" else "//"
    if engine == "spark":
        egen = f"LATERAL VIEW explode(sequence(0, {N_EPOCHS - 1})) t AS e"
    else:
        egen = (f", LATERAL (SELECT unnest(generate_series(0,"
                f" {N_EPOCHS - 1})) AS e)")
    return f"""WITH {_scored_sql(engine)},
per_source AS (
  -- LEFT join from documents: a doc whose text yields zero tokens
  -- still counts toward its source's natural share (q contributes 0)
  SELECT d.source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(coalesce(s.q, 0)) AS BIGINT) AS sum_q
  FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
  GROUP BY d.source
),
tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS n_all,
         CAST(sum(sum_q) AS BIGINT) AS q_all
  FROM per_source
),
shares AS (
  SELECT p.source,
         CAST({_scaled_div('p.n_docs', 1000, 1000, 't.n_all', div)}
              AS BIGINT) AS nat_ppm,
         CAST({_scaled_div('p.sum_q', 1000, 1000, 't.q_all', div)}
              AS BIGINT) AS qual_ppm
  FROM per_source p CROSS JOIN tot t
)
SELECT CAST(e AS INT) AS epoch, s.source,
       CAST((({N_EPOCHS - 1} - e) * s.nat_ppm + e * s.qual_ppm)
            {div} {N_EPOCHS - 1} AS BIGINT) AS weight_ppm,
       s.nat_ppm, s.qual_ppm
FROM shares s
{egen}
"""


def _q_anneal(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_anneal_sql("spark"))


ANNEAL_DUCK = _anneal_sql("duck")

QUERIES["docs_anneal_mixture_schedule"] = _q_anneal
ORACLES["docs_anneal_mixture_schedule"] = ANNEAL_DUCK
