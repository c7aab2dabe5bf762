"""RLVR (verifiable-reward) data operators: rollout grading, unbiased
pass@k estimation, and GRPO group advantages.

The post-RLHF frontier of training-data work grades ROLLOUTS against a
programmatic verifier instead of a learned reward model (public
anchors: Chen et al. 2021 "Evaluating Large Language Models Trained on
Code" — the unbiased pass@k estimator; Shao et al. 2024 "DeepSeekMath"
— GRPO's group-relative advantage; DeepSeek-R1 2025 — rule-based
verifiable rewards and the 0%/100%-pass filtering of no-signal tasks).
No reference counterpart (the reference is image-caption only); this
extends the preference.py RLHF family one step to verifiable rewards.

Deterministic instantiation (the preference.py seeding pattern):

- a TASK is a document; rollout r of N_ROLLOUTS is a seeded
  ``RESP_CHARS``-char window into it (md5-derived offset, seed
  ``doc_id:v{r}`` — distinct from preference.py's ``:c{k}`` family so
  the two fixtures never alias);
- the VERIFIER's reference answer for a task is the document's MODAL
  token (most frequent whitespace token, ties to the lexicographically
  smallest — one doc-keyed rank, exact in both engines);
- a rollout is CORRECT iff it contains the reference answer as a
  whole whitespace-delimited token (``instr`` on space-padded strings
  — no LIKE, so answer text can never inject wildcards).

Everything downstream is integer-exact:

- **pass@1** per task is ``n_correct * 10^6 DIV n`` (ppm);
- **pass@k** uses the Chen et al. unbiased estimator
  ``1 - C(n-c, k) / C(n, k)`` with the binomial table emitted as a
  36-row VALUES relation (n = 8 fixed, k in {1, 2, 4, 8}), so the
  estimate is a pure integer ratio in ppm — no floats, no log-gamma;
- **GRPO advantage** per rollout is ``correct*10^6 - pass1_ppm``
  (the group-mean-centered reward, ppm), emitted only for tasks with
  0 < c < n — the signal-bearing groups R1-style filtering keeps.

Scale posture: the rollout explode is a bounded ×N fan-out of a
RESP_CHARS window (never the full document); the modal-token table is
one token explode + a (doc, token) map-side-combined count + one
doc-keyed window; grading is a doc_id equi-join; pass@k joins a
constant 36-row table. Nothing shuffles wider than (doc_id, token),
and the comb relation broadcasts.
"""

from __future__ import annotations

from math import comb

from pyspark.sql import DataFrame, SparkSession

from .. import catalog

N_ROLLOUTS = 8
RESP_CHARS = 40
PASS_KS = (1, 2, 4, 8)


def _hr(engine: str) -> str:
    """28-bit md5 int seeded by (doc_id, rollout)."""
    if engine == "spark":
        return ("CAST(conv(substr(md5(concat(doc_id, ':v', r)), 1, 7),"
                " 16, 10) AS BIGINT)")
    return ("CAST(concat('0x', substr(md5(concat(doc_id, ':v', r)), 1, 7))"
            " AS BIGINT)")


def _comb_rows() -> str:
    rows = []
    for m in range(N_ROLLOUTS + 1):
        for k in PASS_KS:
            rows.append(f"({m}, {k}, {comb(m, k)})")
    return ", ".join(rows)


def _comb_cte(engine: str) -> str:
    if engine == "spark":
        return (f"comb AS (SELECT m, k, c FROM VALUES {_comb_rows()}"
                " AS t(m, k, c))")
    return f"comb(m, k, c) AS (VALUES {_comb_rows()})"


def _chain(engine: str, table: str = "documents") -> str:
    """rolls -> ref -> graded -> task: shared by all three queries.
    ``table`` lets the streaming twin run the same chain over a
    micro-batch view."""
    if engine == "spark":
        rgen = f"LATERAL VIEW explode(sequence(0, {N_ROLLOUTS - 1})) t AS r"
        tok_x = "LATERAL VIEW explode(split(text, ' ')) t2 AS token"
    else:
        rgen = (f", LATERAL (SELECT unnest(generate_series(0,"
                f" {N_ROLLOUTS - 1})) AS r)")
        tok_x = ", LATERAL (SELECT unnest(string_split(text, ' ')) AS token)"
    return f"""rolls AS (
  SELECT doc_id, CAST(r AS INT) AS r,
         substr(text,
                CAST(1 + ({_hr(engine)}
                     % greatest(length(text) - {RESP_CHARS - 1}, 1)) AS INT),
                {RESP_CHARS}) AS resp
  FROM {table}
  {rgen}
),
tokc AS (
  SELECT doc_id, token, count(*) AS n
  FROM {table}
  {tok_x}
  WHERE length(token) > 0
  GROUP BY doc_id, token
),
ref AS (
  SELECT doc_id, token AS answer
  FROM (
    SELECT doc_id, token,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY n DESC, token ASC) AS rn
    FROM tokc
  )
  WHERE rn = 1
),
graded AS (
  SELECT ro.doc_id, ro.r, ro.resp,
         CASE WHEN instr(' ' || ro.resp || ' ',
                         ' ' || rf.answer || ' ') > 0
              THEN 1 ELSE 0 END AS correct
  FROM rolls ro JOIN ref rf ON ro.doc_id = rf.doc_id
),
task AS (
  SELECT doc_id,
         CAST(count(*) AS INT) AS n_rolls,
         CAST(sum(correct) AS INT) AS n_correct,
         CAST(count(DISTINCT md5(resp)) AS INT) AS n_distinct_rolls
  FROM graded GROUP BY doc_id
)"""


# --------------------------------------------------- per-task grading
# The RLVR curation view: per task the verifier verdict counts, the
# distinct-rollout count (duplicate rollouts carry no extra GRPO
# signal), and the has_signal flag R1-style filtering keys on.

_GRADE_TAIL = """
SELECT t.doc_id, t.n_rolls AS n_rollouts, t.n_correct,
       t.n_distinct_rolls AS n_distinct_rollouts,
       CAST(t.n_correct * 1000000 {div} t.n_rolls AS BIGINT) AS pass1_ppm,
       t.n_correct > 0 AND t.n_correct < t.n_rolls AS has_signal,
       md5(rf.answer) AS answer_md5
FROM task t JOIN ref rf ON t.doc_id = rf.doc_id
"""

# ------------------------------------------------ unbiased pass@k
# Corpus rollup of the Chen et al. estimator: per task
# 1 - C(n-c,k)/C(n,k), averaged over tasks, all in integer ppm. The
# per-task ppm truncation happens IDENTICALLY in both engines so the
# mean is exact.

_PASSK_TAIL = """
, sel AS (
  SELECT t.doc_id, cb.k,
         1000000 - (cb.c * 1000000 {div} cn.c) AS task_ppm
  FROM task t
       JOIN comb cb ON cb.m = t.n_rolls - t.n_correct
       JOIN comb cn ON cn.m = t.n_rolls AND cn.k = cb.k
)
SELECT CAST(k AS INT) AS k,
       CAST(count(*) AS BIGINT) AS n_tasks,
       CAST(sum(task_ppm) {div} count(*) AS BIGINT) AS pass_at_k_ppm
FROM sel GROUP BY k
"""

# ------------------------------------------- GRPO group advantages
# Per-rollout group-relative advantage on signal-bearing tasks only:
# adv = r_i - mean(r) with rewards in {0, 1}, scaled to ppm. Tasks
# where every rollout agrees (c = 0 or c = n) contribute zero gradient
# and are dropped — the DeepSeek-R1 effective-batch rule.

_GRPO_TAIL = """
SELECT g.doc_id, CAST(g.r AS INT) AS rollout,
       CAST(g.correct AS INT) AS correct,
       CAST(g.correct * 1000000
            - (t.n_correct * 1000000 {div} t.n_rolls) AS BIGINT) AS adv_ppm
FROM graded g JOIN task t ON g.doc_id = t.doc_id
WHERE t.n_correct > 0 AND t.n_correct < t.n_rolls
"""


def _sql(
    engine: str, tail: str, with_comb: bool = False,
    table: str = "documents",
) -> str:
    div = "DIV" if engine == "spark" else "//"
    ctes = _chain(engine, table)
    if with_comb:
        ctes = ctes + ",\n" + _comb_cte(engine)
    return f"WITH {ctes}" + tail.format(div=div)


def _run(sql: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
            "documents"
        )
        return spark.sql(sql)

    return q


GRADE_SPARK = _sql("spark", _GRADE_TAIL)
GRADE_DUCK = _sql("duck", _GRADE_TAIL)
PASSK_SPARK = _sql("spark", _PASSK_TAIL, with_comb=True)
PASSK_DUCK = _sql("duck", _PASSK_TAIL, with_comb=True)
GRPO_SPARK = _sql("spark", _GRPO_TAIL)
GRPO_DUCK = _sql("duck", _GRPO_TAIL)

QUERIES = {
    "docs_verifier_grade": _run(GRADE_SPARK),
    "docs_passk_estimate": _run(PASSK_SPARK),
    "docs_grpo_advantage": _run(GRPO_SPARK),
}
ORACLES = {
    "docs_verifier_grade": GRADE_DUCK,
    "docs_passk_estimate": PASSK_DUCK,
    "docs_grpo_advantage": GRPO_DUCK,
}
