"""Bigram language-model quality scoring (CCNet-style perplexity
filter, exact arithmetic).

The public recipe (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data"): train a small LM on a
trusted slice, score every document, filter by score percentile.
Here the trusted slice is the ``lang = 'en'`` documents and the LM is
an add-one-smoothed bigram model trained on that slice; every
document (all languages) is scored against it.

Determinism (README "Design rules" / the search.py precedent): engine
``ln()`` differs in the last ulp between Spark's JVM and DuckDB's
libm, so a literal log-prob sum would flake the driver's value hash.
Instead each bigram contributes its INVERSE smoothed conditional
probability ``(c(w1) + V) / (c(w1 w2) + 1)`` — the local branching
factor, whose geometric mean is exactly perplexity.  We report the
arithmetic mean: same monotone "rare transitions score high" signal,
but every term is one integer-ratio double division (correctly
rounded IEEE, identical bits in both engines), rounded to 6 decimals
and accumulated in DECIMAL — order-independent, hash-stable.  A
threshold filter on this surrogate selects the same kind of tail a
perplexity filter does; out-of-vocabulary contexts degrade to
``(0 + V) / 1 = V``, the uniform-model branching factor, exactly as
add-one smoothing prescribes.

Adjacency: documents are whitespace-tokenized in place (split on a
single space); an empty token (from a doubled space) acts as a break
— no bigram is formed across it.

At 100 TB: the per-doc ``lag`` window partitions by doc_id (state
bounded by one document); the two LM-count aggregations are
map-side-combined single shuffles over the trusted slice only; the
scoring joins are equi-joins on token keys — broadcast when the
trusted-slice LM is bounded (the CCNet setting: the LM is small by
construction), shuffle hash joins otherwise.  Nothing collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog

_SCORE_BODY = """
big2 AS (
  SELECT doc_id, lang, w1, w2 FROM bigrams
  WHERE w1 IS NOT NULL AND length(w1) > 0 AND length(w2) > 0
),
lm_uni AS (
  SELECT w1, count(*) AS c1
  FROM big2 WHERE lang = 'en' GROUP BY w1
),
lm_big AS (
  SELECT w1, w2, count(*) AS c12
  FROM big2 WHERE lang = 'en' GROUP BY w1, w2
),
v AS (
  SELECT count(DISTINCT token) AS vocab
  FROM toks WHERE lang = 'en' AND length(token) > 0
)
SELECT doc_id,
       count(*) AS n_bigrams,
       CAST(sum(CAST(round(
                CAST(coalesce(c1, 0) + vocab AS DOUBLE)
              / CAST(coalesce(c12, 0) + 1 AS DOUBLE), 6)
            AS DECIMAL(22,6))) AS DOUBLE) AS sum_branching,
       CAST(round(
            CAST(sum(CAST(round(
                     CAST(coalesce(c1, 0) + vocab AS DOUBLE)
                   / CAST(coalesce(c12, 0) + 1 AS DOUBLE), 6)
                 AS DECIMAL(22,6))) AS DOUBLE)
          / CAST(count(*) AS DOUBLE), 6) AS DOUBLE) AS mean_branching
FROM big2
LEFT JOIN lm_big USING (w1, w2)
LEFT JOIN lm_uni USING (w1)
CROSS JOIN v
GROUP BY doc_id
ORDER BY doc_id
"""

BIGRAM_LM_SPARK = f"""
WITH toks AS (
  SELECT doc_id, lang, pos, token
  FROM documents
  LATERAL VIEW posexplode(split(text, ' ')) t AS pos, token
),
bigrams AS (
  SELECT doc_id, lang,
         lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
         token AS w2
  FROM toks
),
{_SCORE_BODY}
"""

BIGRAM_LM_DUCK = f"""
WITH toks AS (
  SELECT doc_id, lang,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS token
  FROM documents
),
bigrams AS (
  SELECT doc_id, lang,
         lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
         token AS w2
  FROM toks
),
{_SCORE_BODY}
"""


def _q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(BIGRAM_LM_SPARK)


# ------------------------- CCNet head/middle/tail perplexity buckets

# The step CCNet actually ships after scoring (Wenzek et al. §4.3):
# per language, rank documents by LM score and cut the corpus into
# head (best 30%), middle (next 40%), tail (worst 30%) — the buckets
# downstream consumers sample from. Shares the EXACT scoring chain
# above (same CTE text, so the bucket query can never drift from the
# score query — the langid_confusion convention), joins lang back in,
# and derives the bucket from integer rank arithmetic
# (rank*10 <= n*3 / n*7) rather than ntile so the cut is pure integer
# comparison with a doc_id tie-break — no dependence on either
# engine's ntile remainder-distribution convention.
#
# At 100 TB: one per-lang window over (score, doc_id) — the sort is
# the cost, O(n log n) per language partition and AQE-splittable; at
# CCNet's own scale they sort per-language shards exactly like this.
# The aggregation after it is a tiny (lang x 3)-key rollup.

_CCNET_BUCKET_TAIL = """
scored AS (
  SELECT s.doc_id, d.lang, s.mean_branching
  FROM scores s JOIN documents d ON s.doc_id = d.doc_id
),
ranked AS (
  SELECT lang, mean_branching,
         row_number() OVER (PARTITION BY lang
                            ORDER BY mean_branching, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM scored
),
bucketed AS (
  SELECT lang,
         CASE WHEN rn * 10 <= n * 3 THEN 'head'
              WHEN rn * 10 <= n * 7 THEN 'middle'
              ELSE 'tail' END AS bucket,
         mean_branching
  FROM ranked
)
SELECT lang, bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(mean_branching) AS min_score,
       max(mean_branching) AS max_score,
       CAST(round(
            CAST(sum(CAST(mean_branching AS DECIMAL(22,6))) AS DOUBLE)
          / CAST(count(*) AS DOUBLE), 6) AS DOUBLE) AS mean_score
FROM bucketed
GROUP BY lang, bucket
ORDER BY lang, bucket
"""

CCNET_BUCKETS_SPARK = f"""
WITH scores AS (
{BIGRAM_LM_SPARK}
),
{_CCNET_BUCKET_TAIL}
"""

CCNET_BUCKETS_DUCK = f"""
WITH scores AS (
{BIGRAM_LM_DUCK}
),
{_CCNET_BUCKET_TAIL}
"""


def _q_ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(CCNET_BUCKETS_SPARK)


QUERIES = {
    "docs_bigram_lm_score": _q_bigram_lm_score,
    "docs_ccnet_ppl_buckets": _q_ccnet_ppl_buckets,
}
ORACLES = {
    "docs_bigram_lm_score": BIGRAM_LM_DUCK,
    "docs_ccnet_ppl_buckets": CCNET_BUCKETS_DUCK,
}
