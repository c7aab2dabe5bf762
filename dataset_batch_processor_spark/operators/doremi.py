"""DoReMi-style domain mixture reweighting (Xie et al. 2023,
"DoReMi: Optimizing Data Mixtures Speeds Up Language Model
Pretraining" — the domain-weight trainer of a pretraining pipeline).

Structure kept from the paper: per-domain EXCESS LOSS against a
reference drives multiplicative-weights updates, with per-round
renormalization and uniform smoothing, over T rounds; domains the
proxy finds hard gain mixture weight. Documented simplifications,
each forced by the repo's exact-arithmetic hash gate (the same
contract as the DSIR ratio-sum and CCNet inverse-probability
surrogates):

* **Static proxy loss.** The paper re-trains the proxy between
  rounds; here the per-doc loss is computed ONCE — an OOV-rate
  difficulty surrogate (tokens outside the top-``VOCAB_K`` corpus
  vocabulary, in ppm; integer trunc division) standing in for
  log-perplexity, which the no-ln rule forbids. The iteration is
  still genuinely fixpoint-free because smoothing and
  renormalization interact across rounds.
* **Linearized MWU.** ``w * exp(eta * excess)`` becomes
  ``w * (10^6 + excess_ppm)`` (eta = 1 in Q6) — the standard
  linearized multiplicative-weights step, exact in int64
  (weights <= 10^6, factors <= 2*10^6, products < 2^53).
* **Smoothing** per the paper: after renormalizing to ppm,
  ``w <- ((10^6 - SMOOTH_Q) * w + SMOOTH_Q * u) DIV 10^6`` with
  uniform ``u = 10^6 DIV k`` and SMOOTH_Q = 10^4 (s = 1%).

Every division is trunc-toward-zero on non-negative integers, so
Python ``//``, Spark ``DIV``, and DuckDB ``//`` agree exactly.

Distribution shape (the coreset/BPE-train house pattern): the
corpus-scale work — tokenize, top-K vocabulary, per-doc OOV rates,
per-domain means — is distributed (two explode+groupBy passes plus a
broadcast vocabulary semi-join); the MWU rounds run on the driver
over ONE k-domain-row collect (20 rows at the fixture; domain counts
are corpus-independent), and the DuckDB oracle replays the full
trajectory as T unrolled k-row CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog

VOCAB_K = 64       # in-vocabulary head of the corpus word distribution
DOREMI_ROUNDS = 6  # MWU rounds (unrolled in the oracle)
SMOOTH_Q = 10_000  # uniform-smoothing mass per round, Q6 (1%)
Q6 = 1_000_000

WORD_RE = "[a-z]+"


def domain_losses(docs: DataFrame, vocab_k: int = VOCAB_K) -> DataFrame:
    """(source, n_docs, loss_ppm): per-domain mean OOV difficulty.
    loss of a doc = 10^6 * oov_tokens DIV tokens (docs with no [a-z]+
    token are skipped — no loss is defined for them); domain loss =
    sum(doc losses) DIV n_docs."""
    toks = docs.select(
        "doc_id", "source",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{WORD_RE}', 0)")
        ).alias("w"),
    )
    vocab = (
        toks.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(vocab_k)
        .select("w")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("_iv", F.lit(1))), "w", "left"
    )
    per_doc = flagged.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.sum(F.when(F.col("_iv").isNull(), 1).otherwise(0)).alias("n_oov"),
    ).select(
        "source",
        F.expr(f"n_oov * {Q6} DIV n_tok").alias("loss_ppm"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("sum(loss_ppm) DIV count(1)").cast("long").alias("loss_ppm"),
    )


def mwu_trajectory(
    stats: list[tuple[str, int, int]], rounds: int = DOREMI_ROUNDS
) -> list[tuple[str, int, int, int, int]]:
    """Driver-side exact-integer MWU over the k-row domain table.
    ``stats`` = [(source, n_docs, loss_ppm)]; returns
    [(source, n_docs, loss_ppm, excess_ppm, weight_ppm)] with the
    round-``rounds`` weights. Excess is vs the doc-weighted corpus
    mean (sum(n_docs*loss) DIV sum(n_docs))."""
    k = len(stats)
    total_docs = sum(n for _, n, _ in stats)
    overall = sum(n * lp for _, n, lp in stats) // total_docs
    excess = {s: lp - overall for s, _, lp in stats}
    uniform = Q6 // k
    w = {s: uniform for s, _, _ in stats}
    for _ in range(rounds):
        raw = {s: w[s] * (Q6 + excess[s]) for s in w}
        tot = sum(raw.values())
        w = {s: raw[s] * Q6 // tot for s in w}
        w = {
            s: ((Q6 - SMOOTH_Q) * w[s] + SMOOTH_Q * uniform) // Q6
            for s in w
        }
    return sorted(
        (s, n, lp, excess[s], w[s]) for s, n, lp in stats
    )


def _q_doremi_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.load_table(spark, sf_dir, "documents")
    stats = [
        (r["source"], int(r["n_docs"]), int(r["loss_ppm"]))
        for r in domain_losses(docs).collect()  # k domain rows only
    ]
    rows = mwu_trajectory(stats)
    return spark.createDataFrame(
        rows,
        "source STRING, n_docs BIGINT, loss_ppm BIGINT, "
        "excess_ppm BIGINT, weight_ppm BIGINT",
    ).orderBy("source")


def _doremi_duck(rounds: int = DOREMI_ROUNDS) -> str:
    """Unrolled replay: vocabulary, per-doc OOV ppm, domain stats,
    then ``rounds`` MWU CTEs of k rows each. AS MATERIALIZED per the
    unrolled-oracle convention."""
    parts = [
        f"""
toks AS MATERIALIZED (
  SELECT doc_id, source,
         unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS w
  FROM documents
),
vocab AS MATERIALIZED (
  SELECT w FROM (
    SELECT w, count(*) AS cnt,
           row_number() OVER (ORDER BY count(*) DESC, w ASC) AS rn
    FROM toks GROUP BY w
  ) WHERE rn <= {VOCAB_K}
),
per_doc AS MATERIALIZED (
  SELECT source,
         (sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) * {Q6})
           // count(*) AS loss_ppm
  FROM toks t LEFT JOIN vocab v ON v.w = t.w
  GROUP BY t.doc_id, t.source
),
dom AS MATERIALIZED (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(loss_ppm) // count(*) AS BIGINT) AS loss_ppm
  FROM per_doc GROUP BY source
),
exc AS MATERIALIZED (
  SELECT source, n_docs, loss_ppm,
         CAST(loss_ppm - (SELECT sum(n_docs * loss_ppm) // sum(n_docs)
                          FROM dom) AS BIGINT) AS excess_ppm,
         (SELECT {Q6} // count(*) FROM dom) AS uniform
  FROM dom
),
w0 AS MATERIALIZED (
  SELECT source, uniform AS w FROM exc
)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"""
r{t} AS MATERIALIZED (
  SELECT e.source, w{t - 1}.w * ({Q6} + e.excess_ppm) AS raw
  FROM exc e JOIN w{t - 1} ON w{t - 1}.source = e.source
),
w{t} AS MATERIALIZED (
  SELECT r.source,
         ((({Q6} - {SMOOTH_Q})
           * (r.raw * {Q6} // (SELECT sum(raw) FROM r{t})))
          + {SMOOTH_Q} * (SELECT uniform FROM exc LIMIT 1)) // {Q6} AS w
  FROM r{t} r
)"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
SELECT e.source, e.n_docs, e.loss_ppm, e.excess_ppm,
       CAST(w{rounds}.w AS BIGINT) AS weight_ppm
FROM exc e JOIN w{rounds} ON w{rounds}.source = e.source
ORDER BY e.source
"""
    )


QUERIES = {"docs_doremi_mixture": _q_doremi_mixture}
ORACLES = {"docs_doremi_mixture": _doremi_duck()}
