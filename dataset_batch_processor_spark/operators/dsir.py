"""DSIR-style data selection via hashed-n-gram importance weights.

Public method (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling"): estimate a target and a raw unigram
distribution over HASHED token buckets, weight every document by how
target-like its tokens are, and keep the highest-weighted documents.
Extension surface — the reference (majidfida/DataSet-Batch-Processor)
has no model-targeted data selection; this is the stage a pretraining
pipeline runs between quality filtering and sampling.

Faithful structure, engine-exact arithmetic:

* hashed buckets — md5-derived 24-bit integer mod ``N_BUCKETS``
  (the feathash.py idiom), so Spark and DuckDB bucket identically
  with no vocabulary state; at 100 TB the bucket table stays 4096
  rows no matter the corpus.
* add-one smoothed bucket probabilities in integer parts-per-billion
  (integer DIV, exact).
* per-document importance score — the paper sums per-token LOG
  probability ratios; engine ``ln()`` differs in the last ulp between
  Spark and DuckDB, so (repo convention, see lmscore.py /
  corpusstats.py) the oracled score is the documented **ratio-sum
  surrogate**: mean over token instances of the integer-ppm
  probability ratio p_target(bucket)/p_raw(bucket). Monotone per
  token, exact integers end to end.

Scale shape: tokenize → bucket is a narrow map; both aggregations
are map-side combined (4096 bucket rows; one row per document after
partial aggregation); the 4096-row weight table is broadcast. No
corpus-sized shuffle anywhere, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog

N_BUCKETS = 4096
TARGET_LANG = "en"  # the target slice DSIR steers toward
TOP_N = 50
_PPB = 1_000_000_000
_PPM = 1_000_000


def _bucketed_tokens(docs: DataFrame, n: int = 1) -> DataFrame:
    """doc_id, lang, bucket — one row per n-gram instance. ``n=1`` is
    the unigram form; ``n=2`` hashes word bigrams, the feature space
    the DSIR paper actually uses. Gram construction slides over the
    split-token ARRAY map-side (the decontam.py window-free idiom) —
    no per-doc window, no extra shuffle."""
    if n == 1:
        grams = (
            docs.select(
                "doc_id",
                "lang",
                F.explode(F.split(F.col("text"), " ")).alias("token"),
            )
            .filter(F.col("token") != "")
        )
    else:
        toks = docs.select(
            "doc_id",
            "lang",
            F.filter(
                F.split(F.col("text"), " "), lambda w: w != ""
            ).alias("t"),
        ).filter(F.size("t") >= n)
        grams = toks.select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(t) - {n}),"
                    f" i -> concat_ws(' ', slice(t, i + 1, {n})))"
                )
            ).alias("token"),
        )
    return grams.select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("token"), 1, 6), 16, 10)
            .cast("long")
            % N_BUCKETS
        ).alias("bucket"),
    )


def _per_doc_buckets(docs: DataFrame, n: int = 1) -> DataFrame:
    """(doc_id, lang, bucket, c) — token instances pre-collapsed per
    document and bucket. Both the weight estimate and the scoring
    join derive from THIS frame with identical aggregations upstream,
    so at execution the tokenize+md5 pass and its exchange are
    computed once and reused (ReusedExchange), not twice from raw
    docs (review round 8)."""
    return (
        _bucketed_tokens(docs, n)
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def dsir_bucket_weights(docs: DataFrame, n: int = 1) -> DataFrame:
    """4096-row table: bucket -> integer-ppm importance ratio.

    ratio_ppm = p_target(bucket) / p_raw(bucket), both add-one
    smoothed and quantized to parts-per-billion BEFORE the ratio, so
    every intermediate is an exact integer below 2^53.
    """
    return _weights_from_per_doc(_per_doc_buckets(docs, n))


def _weights_from_per_doc(per_doc: DataFrame) -> DataFrame:
    counts = per_doc.groupBy("bucket").agg(
        F.sum("c").cast("long").alias("r_cnt"),
        F.sum(
            F.when(F.col("lang") == TARGET_LANG, F.col("c")).otherwise(0)
        ).cast("long").alias("t_cnt"),
    )
    totals = counts.agg(
        F.sum("r_cnt").cast("long").alias("r_tot"),
        F.sum("t_cnt").cast("long").alias("t_tot"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.expr(
                f"(t_cnt + 1) * {_PPB} DIV (t_tot + {N_BUCKETS})"
            ).alias("pt_ppb"),
            F.expr(
                f"(r_cnt + 1) * {_PPB} DIV (r_tot + {N_BUCKETS})"
            ).alias("pr_ppb"),
        )
        .select(
            "bucket",
            F.expr(f"pt_ppb * {_PPM} DIV pr_ppb").alias("ratio_ppm"),
        )
    )


def dsir_scores(docs: DataFrame, n: int = 1) -> DataFrame:
    """Per-document DSIR score: mean token-instance importance ratio
    (integer ppm). > 1e6 means more target-like than the raw corpus.
    """
    # Materialize the collapsed (doc, bucket) counts ONCE — the
    # weight branch and the scoring branch otherwise each re-run the
    # tokenize+md5 pipeline (the dominant cost; their differing
    # aggregate schemas defeat ReusedExchange). localCheckpoint is
    # partition-local (no shuffle) and the frame is the post-collapse
    # size, far below the raw token stream (review round 8).
    per_doc = _per_doc_buckets(docs, n).localCheckpoint()
    weights = _weights_from_per_doc(per_doc)
    return (
        per_doc.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("ratio_ppm")).cast("long").alias(
                "score_sum"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr("score_sum DIV n_tokens").alias("dsir_score_ppm"),
        )
    )


def dsir_select(docs: DataFrame, top_n: int = TOP_N, n: int = 1) -> DataFrame:
    """The selection: top-N documents by DSIR score (doc_id breaks
    ties, so the cut is deterministic on both engines)."""
    scores = dsir_scores(docs, n)
    return (
        scores.join(docs.select("doc_id", "lang"), "doc_id")
        .orderBy(F.desc("dsir_score_ppm"), F.asc("doc_id"))
        .limit(top_n)
        .select("doc_id", "lang", "n_tokens", "dsir_score_ppm")
    )


def _q_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_select(catalog.load_table(spark, sf_dir, "documents"))


DSIR_DUCK = f"""
WITH toks AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5(u.token), 1, 6)) AS BIGINT)
           % {N_BUCKETS} AS bucket
  FROM documents, unnest(string_split(text, ' ')) AS u(token)
  WHERE u.token <> ''
),
counts AS (
  SELECT bucket,
         CAST(count(*) AS BIGINT) AS r_cnt,
         CAST(count(*) FILTER (WHERE lang = '{TARGET_LANG}') AS BIGINT)
           AS t_cnt
  FROM toks GROUP BY bucket
),
totals AS (
  SELECT CAST(sum(r_cnt) AS BIGINT) AS r_tot,
         CAST(sum(t_cnt) AS BIGINT) AS t_tot
  FROM counts
),
weights AS (
  SELECT bucket,
         ((t_cnt + 1) * {_PPB} // (t_tot + {N_BUCKETS})) * {_PPM}
           // ((r_cnt + 1) * {_PPB} // (r_tot + {N_BUCKETS}))
           AS ratio_ppm
  FROM counts, totals
),
scores AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(w.ratio_ppm) AS BIGINT) AS score_sum
  FROM toks t JOIN weights w ON t.bucket = w.bucket
  GROUP BY t.doc_id
)
SELECT s.doc_id, d.lang, s.n_tokens,
       CAST(s.score_sum // s.n_tokens AS BIGINT) AS dsir_score_ppm
FROM scores s JOIN documents d ON s.doc_id = d.doc_id
ORDER BY dsir_score_ppm DESC, s.doc_id ASC
LIMIT {TOP_N}
"""

def _q_dsir_bigram_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fanout (guide §2.5): the bigram hash chain is the scan stage;
    # 1.87 -> 1.28 s at sf0.1
    return dsir_select(
        catalog.fanout(catalog.load_table(spark, sf_dir, "documents")), n=2
    )


# Bigram oracle: identical pipeline with the gram CTE swapped in —
# grams built by the same slide-over-array construction.
DSIR_BIGRAM_DUCK = DSIR_DUCK.replace(
    """WITH toks AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5(u.token), 1, 6)) AS BIGINT)
           % 4096 AS bucket
  FROM documents, unnest(string_split(text, ' ')) AS u(token)
  WHERE u.token <> ''
)""",
    """WITH tarr AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), w -> w <> '') AS t
  FROM documents
),
toks AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5(u.token), 1, 6)) AS BIGINT)
           % 4096 AS bucket
  FROM tarr,
       unnest(list_transform(generate_series(1, len(t) - 1),
              i -> t[i] || ' ' || t[i + 1])) AS u(token)
  WHERE len(t) >= 2
)""",
)
assert "tarr" in DSIR_BIGRAM_DUCK  # the replace must have matched

QUERIES = {
    "docs_dsir_selection": _q_dsir_selection,
    "docs_dsir_bigram_selection": _q_dsir_bigram_selection,
}
ORACLES = {
    "docs_dsir_selection": DSIR_DUCK,
    "docs_dsir_bigram_selection": DSIR_BIGRAM_DUCK,
}
