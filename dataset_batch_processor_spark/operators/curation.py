"""Corpus-curation operators: splits, samples, shard packing.

The everyday moves of a training-data pipeline, all deterministic
(hash-based, not rand()-based) so runs are reproducible, resumable,
and oracle-checkable:

- **train/val split** — md5-bucket assignment per doc. Hash-based
  splits are stable under corpus growth (a doc's split never changes
  when other docs are added) — the property rand() sampling lacks.
- **stratified sample** — per-stratum deterministic rate via the same
  hash; no shuffle at all (pure filter), stratification comes free
  because the hash is uniform within every stratum.
- **token-budget shard packing** — documents packed into shards of
  ~BUDGET tokens each: cumulative token count over a deterministic
  order, shard id = floor(cumsum / budget). The cumulative sum runs
  through textops.exclusive_prefix_sum (range-partitioned two-pass,
  no single-task window), with the order key hash-distributed so no
  stratum hotspot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog
from .sqlrun import _run

TRAIN_PCT = 90  # md5 % 100 < 90 -> train

SPLIT_SPARK = f"""
SELECT doc_id, lang,
       CASE WHEN CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)
                 AS BIGINT) % 100 < {TRAIN_PCT}
            THEN 'train' ELSE 'val' END AS split
FROM documents
"""

SPLIT_DUCK = f"""
SELECT doc_id, lang,
       CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) % 100 < {TRAIN_PCT}
            THEN 'train' ELSE 'val' END AS split
FROM documents
"""

SPLIT_COUNTS_SPARK = f"""
SELECT lang, split, count(*) AS n_docs
FROM (
  SELECT lang,
         CASE WHEN CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)
                   AS BIGINT) % 100 < {TRAIN_PCT}
              THEN 'train' ELSE 'val' END AS split
  FROM documents
)
GROUP BY lang, split
ORDER BY lang, split
"""

SPLIT_COUNTS_DUCK = f"""
SELECT lang, split, count(*) AS n_docs
FROM (
  SELECT lang,
         CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 100 < {TRAIN_PCT}
              THEN 'train' ELSE 'val' END AS split
  FROM documents
)
GROUP BY lang, split
ORDER BY lang, split
"""

SAMPLE_RATE_PCT = 20  # deterministic 20% per stratum

STRATIFIED_SPARK = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE CAST(conv(substr(md5(concat(lang, ':', CAST(doc_id AS STRING))), 1, 15),
          16, 10) AS BIGINT) % 100 < {SAMPLE_RATE_PCT}
"""

STRATIFIED_DUCK = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE CAST(concat('0x', substr(md5(concat(lang, ':', doc_id)), 1, 15))
          AS BIGINT) % 100 < {SAMPLE_RATE_PCT}
"""

TOKEN_BUDGET = 20_000  # ~tokens per shard

# shard packing: deterministic order = (hash, doc_id); token count =
# whitespace tokens; shard id from the EXCLUSIVE running sum so a doc
# that crosses the boundary starts the next shard. The running sum is
# NOT an unpartitioned window (single-task funnel at 100 TB) — it goes
# through textops.exclusive_prefix_sum: range partition on (h, doc_id),
# per-partition cumsum, broadcast offsets.


def _q_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .textops import exclusive_prefix_sum

    docs = catalog.load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.expr(
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)"
            " AS BIGINT)"
        ).alias("h"),
    )
    packed = exclusive_prefix_sum(
        sized, ["h", "doc_id"], "n_tokens", out_col="tokens_before"
    )
    return packed.select(
        "doc_id",
        "n_tokens",
        F.floor(F.col("tokens_before") / TOKEN_BUDGET).cast("bigint").alias(
            "shard_id"
        ),
    )

SHARD_DUCK = f"""
WITH sized AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM documents
),
packed AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS tokens_before
  FROM sized
)
SELECT doc_id, n_tokens,
       CAST(floor(tokens_before / {TOKEN_BUDGET}) AS BIGINT) AS shard_id
FROM packed
"""

# Weighted sampling without replacement, deterministic: rank every doc
# by hash-uniform / weight and take the k smallest — the fixed-seed
# analogue of A-ES reservoir sampling (longer docs proportionally more
# likely), except fully rerunnable: same corpus -> same sample, on any
# cluster size. The ranking key never leaves the plan (output columns
# are integers), so float association can't touch the driver hash.
# Scale: map-side key computation + global top-k
# (TakeOrderedAndProject: per-partition heaps, k-row driver merge).

WEIGHTED_K = 50

WEIGHTED_SPARK = f"""
SELECT doc_id, lang, n_chars
FROM (
  SELECT doc_id, lang, n_chars,
         CAST(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)
              AS BIGINT) % 1000000000 AS DOUBLE)
           / CAST(n_chars AS DOUBLE) AS r
  FROM documents
  WHERE n_chars > 0
)
ORDER BY r ASC, doc_id ASC
LIMIT {WEIGHTED_K}
"""

WEIGHTED_DUCK = f"""
SELECT doc_id, lang, n_chars
FROM (
  SELECT doc_id, lang, n_chars,
         CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 1000000000 AS DOUBLE)
           / CAST(n_chars AS DOUBLE) AS r
  FROM documents
  WHERE n_chars > 0
)
ORDER BY r ASC, doc_id ASC
LIMIT {WEIGHTED_K}
"""

# Epoch-aware deterministic shuffle: the training-reader contract is
# (shard assignment, within-shard order) re-derived per epoch from a
# seeded hash — same corpus + same epoch -> same order on any cluster
# size; next epoch -> a fresh permutation with zero state carried.
# Deliberately WINDOWLESS: emitting (shard, sort_key) instead of a
# materialized row_number keeps the plan a narrow map (the writer
# repartitions by shard and sortWithinPartitions(sort_key), so the
# position never needs a shard-sized window task at 100 TB).

EPOCH = 2
EPOCH_SHARDS = 8

EPOCH_SHUFFLE_SPARK = f"""
SELECT doc_id,
       CAST(k % {EPOCH_SHARDS} AS INT) AS shard,
       k AS sort_key
FROM (
  SELECT doc_id,
         CAST(conv(substr(md5(concat('epoch{EPOCH}:',
                CAST(doc_id AS STRING))), 1, 15), 16, 10)
              AS BIGINT) AS k
  FROM documents
)
ORDER BY shard, sort_key, doc_id
"""

EPOCH_SHUFFLE_DUCK = f"""
SELECT doc_id,
       CAST(k % {EPOCH_SHARDS} AS INT) AS shard,
       k AS sort_key
FROM (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(concat('epoch{EPOCH}:',
                CAST(doc_id AS VARCHAR))), 1, 15))
              AS BIGINT) AS k
  FROM documents
)
ORDER BY shard, sort_key, doc_id
"""

# Token-level sequence packing: the GPT-style concat-and-split that
# turns a shuffled corpus into fixed-length training sequences. Each
# doc contributes n_tokens + 1 (its EOS separator); its global token
# offset over the epoch-shuffle order maps it to
# [first_seq, last_seq] windows of length SEQ_LEN with a starting
# offset inside the first. The cumulative sum goes through
# textops.exclusive_prefix_sum (range-partitioned two-pass, no
# single-task window) — same scalable shape as shard packing, one
# token granularity finer.

SEQ_LEN = 512


def _q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .textops import exclusive_prefix_sum

    docs = catalog.load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        (F.size(F.split("text", " ")) + 1).cast("bigint").alias("n_units"),
        F.expr(
            f"CAST(conv(substr(md5(concat('epoch{EPOCH}:', "
            "CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        ).alias("k"),
    )
    packed = exclusive_prefix_sum(
        sized, ["k", "doc_id"], "n_units", out_col="tok_before"
    )
    return packed.select(
        "doc_id",
        "n_units",
        "tok_before",
        F.floor(F.col("tok_before") / SEQ_LEN).cast("bigint").alias(
            "first_seq"
        ),
        F.floor(
            (F.col("tok_before") + F.col("n_units") - 1) / SEQ_LEN
        ).cast("bigint").alias("last_seq"),
        (F.col("tok_before") % SEQ_LEN).cast("int").alias("offset_in_seq"),
    )


SEQ_PACK_DUCK = f"""
WITH sized AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) + 1 AS BIGINT) AS n_units,
         CAST(concat('0x', substr(md5(concat('epoch{{EPOCH}}:',
                CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS k
  FROM documents
),
packed AS (
  SELECT doc_id, n_units,
         CAST(coalesce(sum(n_units) OVER (ORDER BY k, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_before
  FROM sized
)
SELECT doc_id, n_units, tok_before,
       CAST(floor(tok_before / {{L}}) AS BIGINT) AS first_seq,
       CAST(floor((tok_before + n_units - 1) / {{L}}) AS BIGINT)
         AS last_seq,
       CAST(tok_before % {{L}} AS INT) AS offset_in_seq
FROM packed
""".replace("{EPOCH}", str(EPOCH)).replace("{L}", str(SEQ_LEN))

# Language rebalancing: downsample every language to the smallest
# language's count — the standard fix for web-crawl language skew
# before multilingual training. The per-lang keep-rate is the exact
# integer threshold floor(min_cnt * 1e6 / lang_cnt) compared against
# a per-doc md5 draw, so the sample is deterministic, stratification
# is exact, and corpus growth never flips an already-kept doc (the
# same stability argument as the train/val split). Scale: one count
# aggregation over a handful of lang keys (broadcast back), then a
# pure filter — no shuffle of the data itself.

LANG_REBALANCE_SPARK = """
WITH lang_counts AS (
  SELECT lang, count(*) AS cnt FROM documents GROUP BY lang
),
thresh AS (
  SELECT lang,
         CAST((SELECT min(cnt) FROM lang_counts) * 1000000 DIV cnt
              AS BIGINT) AS keep_below
  FROM lang_counts
)
SELECT doc_id, lang
FROM documents
JOIN thresh USING (lang)
WHERE CAST(conv(substr(md5(concat('rebal:', CAST(doc_id AS STRING))),
               1, 15), 16, 10) AS BIGINT) % 1000000 < keep_below
ORDER BY doc_id
"""

LANG_REBALANCE_DUCK = """
WITH lang_counts AS (
  SELECT lang, count(*) AS cnt FROM documents GROUP BY lang
),
thresh AS (
  SELECT lang,
         CAST((SELECT min(cnt) FROM lang_counts) * 1000000 // cnt
              AS BIGINT) AS keep_below
  FROM lang_counts
)
SELECT doc_id, lang
FROM documents
JOIN thresh USING (lang)
WHERE CAST(concat('0x', substr(md5(concat('rebal:', CAST(doc_id AS VARCHAR))),
               1, 15)) AS BIGINT) % 1000000 < keep_below
ORDER BY doc_id
"""

# ------------------------------------------- leakage-safe splitting
# The dedup-aware split rule every pre-training pipeline needs: hash
# the CLUSTER canonical id (the session-materialized CC labels), not
# the doc id, so a near-duplicate family lands entirely in one split
# — hashing doc ids puts copies of the same document on both sides of
# the train/val boundary (classic eval leakage). The query runs BOTH
# modes and reports, per (mode, split): doc count, distinct clusters
# touched, and the number of candidate pairs straddling the split —
# >0 for the doc-hash baseline (the leak, made visible), 0 for the
# cluster-hash rule. The oracle recomputes the closure itself, so a
# drifted label table cannot hash green.


def _split_hash_expr(keycol: str):
    from pyspark.sql import functions as F

    h = (
        F.conv(
            F.substring(F.md5(F.col(keycol).cast("string")), 1, 15), 16, 10
        ).cast("long")
        % 100
    )
    return F.when(h < TRAIN_PCT, F.lit("train")).otherwise(F.lit("val"))


def _q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .components import doc_dup_labels, pair_graph

    docs = catalog.load_table(spark, sf_dir, "documents").select("doc_id")
    labels = doc_dup_labels(spark, sf_dir).select(
        F.col("node").alias("doc_id"), "comp"
    )
    assign = (
        docs.join(labels, "doc_id", "left")
        .select("doc_id", F.coalesce("comp", "doc_id").alias("ckey"))
        .select(
            "doc_id",
            "ckey",
            _split_hash_expr("doc_id").alias("split_doc"),
            _split_hash_expr("ckey").alias("split_cluster"),
        )
    )
    pairs = pair_graph(spark, sf_dir).select("doc_a", "doc_b")
    pj = pairs.join(
        assign.select(
            F.col("doc_id").alias("doc_a"),
            F.col("split_doc").alias("sd_a"),
            F.col("split_cluster").alias("sc_a"),
        ),
        "doc_a",
    ).join(
        assign.select(
            F.col("doc_id").alias("doc_b"),
            F.col("split_doc").alias("sd_b"),
            F.col("split_cluster").alias("sc_b"),
        ),
        "doc_b",
    )
    cross = pj.agg(
        F.sum(F.when(F.col("sd_a") != F.col("sd_b"), 1).otherwise(0))
        .cast("bigint").alias("doc"),
        F.sum(F.when(F.col("sc_a") != F.col("sc_b"), 1).otherwise(0))
        .cast("bigint").alias("cluster"),
    ).selectExpr(
        "stack(2, 'doc', doc, 'cluster', cluster) "
        "AS (split_mode, n_cross_split_pairs)"
    )

    def counts(split_col: str, mode: str) -> DataFrame:
        return (
            assign.groupBy(F.col(split_col).alias("split"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.countDistinct("ckey").cast("bigint")
                .alias("n_clusters_touched"),
            )
            .withColumn("split_mode", F.lit(mode))
        )

    return (
        counts("split_doc", "doc")
        .unionByName(counts("split_cluster", "cluster"))
        .join(F.broadcast(cross), "split_mode")
        .select(
            "split_mode", "split", "n_docs", "n_clusters_touched",
            F.col("n_cross_split_pairs").cast("bigint")
            .alias("n_cross_split_pairs"),
        )
        .orderBy("split_mode", "split")
    )


def _leakage_split_duck() -> str:
    from .components import _PAIRS_AS_CTE

    h = "CAST(concat('0x', substr(md5(CAST({k} AS VARCHAR)), 1, 15)) AS BIGINT)"
    return (
        "WITH RECURSIVE "
        + _PAIRS_AS_CTE.removeprefix("WITH ")
        + f""",
sym AS (
  SELECT doc_a AS node, doc_b AS nbr FROM pairs
  UNION
  SELECT doc_b AS node, doc_a AS nbr FROM pairs
),
reach(node, other) AS (
  SELECT node, nbr FROM sym
  UNION
  SELECT r.node, s.nbr FROM reach r JOIN sym s ON r.other = s.node
),
labels AS (
  SELECT node, least(node, min(other)) AS comp FROM reach GROUP BY node
),
assign AS (
  SELECT d.doc_id,
         coalesce(l.comp, d.doc_id) AS ckey,
         CASE WHEN {h.format(k='d.doc_id')} % 100 < {TRAIN_PCT}
              THEN 'train' ELSE 'val' END AS split_doc,
         CASE WHEN {h.format(k='coalesce(l.comp, d.doc_id)')} % 100
              < {TRAIN_PCT} THEN 'train' ELSE 'val' END AS split_cluster
  FROM documents d LEFT JOIN labels l ON d.doc_id = l.node
),
cross_counts AS (
  SELECT CAST(sum(CASE WHEN a.split_doc <> b.split_doc
                  THEN 1 ELSE 0 END) AS BIGINT) AS doc_cross,
         CAST(sum(CASE WHEN a.split_cluster <> b.split_cluster
                  THEN 1 ELSE 0 END) AS BIGINT) AS cluster_cross
  FROM pairs p
  JOIN assign a ON p.doc_a = a.doc_id
  JOIN assign b ON p.doc_b = b.doc_id
),
counts AS (
  SELECT 'doc' AS split_mode, split_doc AS split,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT ckey) AS BIGINT) AS n_clusters_touched
  FROM assign GROUP BY 2
  UNION ALL
  SELECT 'cluster', split_cluster,
         CAST(count(*) AS BIGINT), CAST(count(DISTINCT ckey) AS BIGINT)
  FROM assign GROUP BY 2
)
SELECT c.split_mode, c.split, c.n_docs, c.n_clusters_touched,
       CASE WHEN c.split_mode = 'doc' THEN x.doc_cross
            ELSE x.cluster_cross END AS n_cross_split_pairs
FROM counts c CROSS JOIN cross_counts x
ORDER BY split_mode, split
"""
    )


# ------------------------------------ length-bucketed batch packing

# Bucketed batching for training/inference (the dynamic-batching /
# bucketed-sampler idea in every serving stack and seq2seq trainer):
# round each doc's token count up to a power-of-two bucket, fill
# fixed-size batches within each bucket in doc_id order, and report
# the padding waste the bucket choice costs. The batch index comes
# from textops.exclusive_prefix_sum — the W1 scalable global-rank
# machinery — NOT a per-bucket row_number() window, whose
# one-task-per-bucket funnel dies at corpus scale (a handful of
# buckets = a handful of tasks for 100 TB of rows).

BATCH_DOCS = 8  # sequences per batch
# Power-of-two ladder through 4096; documents past the ladder get an
# EXACT bucket of their own token count (each becomes its own
# batch-of-few) rather than a silently-overflowing cap — capacity
# must never be smaller than the content it claims to hold, or the
# padding-waste report goes negative (review round 8).
_BUCKET_CASE = (
    "CASE WHEN {n} <= 16 THEN 16 WHEN {n} <= 32 THEN 32 "
    "WHEN {n} <= 64 THEN 64 WHEN {n} <= 128 THEN 128 "
    "WHEN {n} <= 256 THEN 256 WHEN {n} <= 512 THEN 512 "
    "WHEN {n} <= 1024 THEN 1024 WHEN {n} <= 2048 THEN 2048 "
    "WHEN {n} <= 4096 THEN 4096 ELSE {n} END"
)


def _q_length_bucket_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .textops import exclusive_prefix_sum

    docs = catalog.load_table(spark, sf_dir, "documents")
    n_toks = "size(split(text, ' '))"
    sized = docs.select(
        "doc_id",
        F.expr(n_toks).cast("long").alias("n_tokens"),
        F.expr(_BUCKET_CASE.format(n=n_toks)).cast("long").alias("bucket"),
    ).withColumn("_one", F.lit(1).cast("long"))
    ranked = exclusive_prefix_sum(
        sized, ["bucket", "doc_id"], "_one", out_col="_rank"
    )
    # per-bucket start offsets: a buckets-sized aggregate, broadcast
    starts = ranked.groupBy("bucket").agg(
        F.min("_rank").alias("_start")
    )
    batched = ranked.join(F.broadcast(starts), "bucket").select(
        "bucket",
        "n_tokens",
        F.expr(f"(_rank - _start) DIV {BATCH_DOCS}").alias("batch_id"),
    )
    return (
        batched.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        .select(
            "bucket",
            "batch_id",
            "n_docs",
            "sum_tokens",
            F.expr("n_docs * bucket").cast("long").alias("capacity"),
            F.expr(
                "(n_docs * bucket - sum_tokens) * 1000000"
                " DIV (n_docs * bucket)"
            ).alias("pad_waste_ppm"),
        )
    )


LENGTH_BUCKET_DUCK = f"""
WITH sized AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST({_BUCKET_CASE.format(n="len(string_split(text, ' '))")}
              AS BIGINT) AS bucket
  FROM documents
),
ranked AS (
  SELECT *, row_number()
           OVER (PARTITION BY bucket ORDER BY doc_id) - 1 AS rk
  FROM sized
),
batched AS (
  SELECT bucket, n_tokens, rk // {BATCH_DOCS} AS batch_id FROM ranked
)
SELECT bucket,
       CAST(batch_id AS BIGINT) AS batch_id,
       CAST(count(*) AS INT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(count(*) * bucket AS BIGINT) AS capacity,
       CAST((count(*) * bucket - sum(n_tokens)) * 1000000
            // (count(*) * bucket) AS BIGINT) AS pad_waste_ppm
FROM batched
GROUP BY bucket, batch_id
"""


# --------------------------------- per-source quota sample (round 11)
# The rate-based stratified sample above keeps a PERCENTAGE per
# stratum; a mixture builder often needs an exact QUOTA per source
# ("give me the same k docs from every source, reproducibly on any
# cluster") — bottom-k hash sampling, the deterministic reservoir
# (public anchor: Cohen & Kaplan 2007 bottom-k sketches; the md5
# draw makes it rerunnable, the curation-family contract).
#
# 100-TB shape: a bare per-source row_number window funnels each
# source's entire slice through ONE task (sources are few, slices are
# corpus-sized — a skew funnel). This runs the exact two-level
# tournament instead: bottom-k within (source, draw % B) buckets
# (B=16: B× the parallelism, bounded windows), then bottom-k of the
# B·k survivors. Exactly equivalent to the global bottom-k — a row
# outside its bucket's top k cannot be in the global top k. The
# DuckDB oracle computes the straight one-level window, so the gate
# ALSO proves the tournament's equivalence on the fixture.

QUOTA_K = 20
_QUOTA_BUCKETS = 16

_QUOTA_DRAW_SPARK = (
    "CAST(conv(substr(md5(concat(source, '#', CAST(doc_id AS STRING))),"
    " 1, 15), 16, 10) AS BIGINT)"
)
_QUOTA_DRAW_DUCK = (
    "CAST(concat('0x', substr(md5(concat(source, '#',"
    " CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)"
)

def quota_bottomk_sql(src: str = "documents") -> str:
    """The two-level tournament bottom-k, KEEPING the draw ``h`` —
    the mergeable-partial form: bottom-k is associative (bottom-k of
    per-shard bottom-k's == bottom-k of the union, the same argument
    as the tournament itself), which is what lets the streaming twin
    (streaming/quotagate.py) commit per-batch partials and merge on
    read. Parameterized by source table (the review-finding #2/#3
    convention — never retarget with .replace())."""
    return f"""
WITH draws AS (
  SELECT source, doc_id, {_QUOTA_DRAW_SPARK} AS h FROM {src}
),
lvl1 AS (
  SELECT source, doc_id, h FROM (
    SELECT source, doc_id, h,
           row_number() OVER (PARTITION BY source, h % {_QUOTA_BUCKETS}
                              ORDER BY h, doc_id) AS rb
    FROM draws
  ) WHERE rb <= {QUOTA_K}
)
SELECT source, doc_id, h
FROM (
  SELECT source, doc_id, h,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
  FROM lvl1
) WHERE rn <= {QUOTA_K}
"""


QUOTA_SAMPLE_SPARK = f"""
SELECT source, doc_id,
       CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
            AS INT) AS sample_rank
FROM ({quota_bottomk_sql("documents")})
"""

QUOTA_SAMPLE_DUCK = f"""
SELECT source, doc_id, CAST(rn AS INT) AS sample_rank
FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
  FROM (SELECT source, doc_id, {_QUOTA_DRAW_DUCK} AS h FROM documents)
) WHERE rn <= {QUOTA_K}
"""

QUERIES = {
    "docs_train_val_split": _run(SPLIT_SPARK, ("documents",)),
    "docs_length_bucket_packing": _q_length_bucket_packing,
    "docs_leakage_safe_split": _q_leakage_safe_split,
    "docs_sequence_packing": _q_sequence_packing,
    "docs_lang_rebalance_sample": _run(
        LANG_REBALANCE_SPARK, ("documents",)
    ),
    "docs_split_counts": _run(SPLIT_COUNTS_SPARK, ("documents",)),
    "docs_stratified_sample": _run(STRATIFIED_SPARK, ("documents",)),
    "docs_shard_packing": _q_shard_packing,
    "docs_weighted_sample": _run(WEIGHTED_SPARK, ("documents",)),
    "docs_epoch_shuffle": _run(EPOCH_SHUFFLE_SPARK, ("documents",)),
    "docs_quota_sample": _run(QUOTA_SAMPLE_SPARK, ("documents",)),
}

ORACLES = {
    "docs_train_val_split": SPLIT_DUCK,
    "docs_length_bucket_packing": LENGTH_BUCKET_DUCK,
    "docs_leakage_safe_split": _leakage_split_duck(),
    "docs_sequence_packing": SEQ_PACK_DUCK,
    "docs_lang_rebalance_sample": LANG_REBALANCE_DUCK,
    "docs_split_counts": SPLIT_COUNTS_DUCK,
    "docs_stratified_sample": STRATIFIED_DUCK,
    "docs_shard_packing": SHARD_DUCK,
    "docs_weighted_sample": WEIGHTED_DUCK,
    "docs_epoch_shuffle": EPOCH_SHUFFLE_DUCK,
    "docs_quota_sample": QUOTA_SAMPLE_DUCK,
}


# ------------------------------------------------ token-budget fill

# Training-budget planning: "fill a B-token budget, best docs first".
# Global order = (quality tier, seeded shuffle hash, doc_id) — Gopher
# passes first, deterministic shuffle within a tier — then an
# EXCLUSIVE global prefix sum of token counts decides admission
# (a doc is taken while the tokens before it are under budget, so
# exactly one doc straddles the boundary). The prefix sum is the W1
# scalable machinery (range repartition + broadcast offsets), NOT a
# single-task ORDER BY window; the report rolls up per source. The
# oracle reuses the gopher CTE chain verbatim and a plain window
# cumsum (fixture-sized), cutting at the same integer budget.

FILL_TOKEN_BUDGET = 8_000


def _q_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from . import webquality
    from .textops import exclusive_prefix_sum

    # fanout (guide §2.5): 1.71 -> 1.52 s at sf0.1
    docs = catalog.fanout(catalog.load_table(spark, sf_dir, "documents"))
    quality = webquality.gopher_quality(docs).select(
        "doc_id",
        F.col("passes_gopher").cast("int").alias("passes"),
        F.col("n_words").cast("long").alias("n_words"),
    )
    base = (
        docs.select("doc_id", "source")
        .join(quality, "doc_id")
        .select(
            "doc_id",
            "source",
            "n_words",
            (1 - F.col("passes")).alias("tier"),
            F.substring(
                F.md5(F.col("doc_id").cast("string")), 1, 16
            ).alias("shuf"),
        )
    )
    ps = exclusive_prefix_sum(
        base, ["tier", "shuf", "doc_id"], "n_words", "toks_before"
    )
    taken = ps.withColumn("taken", F.col("toks_before") < FILL_TOKEN_BUDGET)
    return (
        taken.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.sum(F.col("taken").cast("int")).cast("int").alias("n_taken"),
            F.sum(F.when(F.col("taken"), F.col("n_words")).otherwise(0))
            .cast("long")
            .alias("tokens_taken"),
        )
        .orderBy("source")
    )


def _token_budget_duck() -> str:
    from .webquality import GOPHER_CHAIN_DUCK, GOPHER_PASS_PRED_DUCK

    return f"""
WITH {GOPHER_CHAIN_DUCK},
quality AS (
  SELECT b.doc_id,
         CASE WHEN {GOPHER_PASS_PRED_DUCK}
         THEN 1 ELSE 0 END AS passes,
         CAST(b.n_words AS BIGINT) AS n_words
  FROM base b JOIN top t ON b.doc_id = t.doc_id
),
ordered AS (
  SELECT d.doc_id, d.source, q.n_words,
         1 - q.passes AS tier,
         substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 16) AS shuf
  FROM documents d JOIN quality q ON d.doc_id = q.doc_id
),
ps AS (
  SELECT *,
         coalesce(sum(n_words) OVER (
           ORDER BY tier, shuf, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS toks_before
  FROM ordered
)
SELECT source,
       CAST(count(*) AS INT) AS n_docs,
       CAST(sum(CASE WHEN toks_before < {FILL_TOKEN_BUDGET} THEN 1 ELSE 0 END)
            AS INT) AS n_taken,
       CAST(sum(CASE WHEN toks_before < {FILL_TOKEN_BUDGET} THEN n_words
                     ELSE 0 END) AS BIGINT) AS tokens_taken
FROM ps
GROUP BY source
ORDER BY source
"""


QUERIES["docs_token_budget_fill"] = _q_token_budget_fill
ORACLES["docs_token_budget_fill"] = _token_budget_duck()


# --------------------------------------- curriculum staging (round 9)
# Difficulty-ordered curriculum (Bengio et al. 2009 shape, the
# easy-to-hard data ordering a pretraining scheduler consumes): rank
# every document by a difficulty signal WITHIN its source (keyed
# window — a global rank would serialize the corpus through one
# task), cut the ranking into 4 stages by integer ppm quartile, and
# report per (source, stage): doc count, mean difficulty, and the
# token mass the stage contributes. Difficulty = the DoReMi OOV-rate
# surrogate, with the vocabulary size and word regex INTERPOLATED
# from doremi.py so the mixture trainer and the curriculum can never
# silently measure different things. Documents with no word token
# produce no rows and are ABSENT from the staging (they carry no
# token mass to schedule). All stage arithmetic is integer:
# stage = least(3, (rn-1)*4 DIV n). The one dialect split (explode
# vs LATERAL unnest) is a template parameter — no string surgery.

def _curriculum_sql(engine: str) -> str:
    from .doremi import VOCAB_K, WORD_RE

    div = "DIV" if engine == "spark" else "//"
    toks = (
        f"SELECT doc_id, source,\n"
        f"         explode(regexp_extract_all(lower(text),"
        f" '{WORD_RE}', 0)) AS w\n  FROM documents"
        if engine == "spark"
        else
        f"SELECT doc_id, source, t.w\n  FROM documents,\n"
        f"       LATERAL (SELECT unnest(regexp_extract_all(lower(text),\n"
        f"                '{WORD_RE}')) AS w) t"
    )
    return f"""
WITH toks AS (
  {toks}
),
vocab AS (
  -- ORDER BY + LIMIT, not a global row_number window: Spark compiles
  -- this to TakeOrderedAndProject (no single-partition window over
  -- the distinct-word table); DuckDB is dialect-identical
  SELECT w FROM (
    SELECT w, count(*) AS cnt FROM toks GROUP BY w
    ORDER BY cnt DESC, w ASC LIMIT {VOCAB_K}
  )
),
per_doc AS (
  SELECT t.doc_id, t.source,
         CAST(count(*) AS BIGINT) AS n_tok,
         CAST((sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) * 1000000)
              {div} count(*) AS BIGINT) AS difficulty_ppm
  FROM toks t LEFT JOIN vocab v ON v.w = t.w
  GROUP BY t.doc_id, t.source
),
staged AS (
  SELECT source, n_tok, difficulty_ppm,
         CAST(least(3, (row_number() OVER (
                PARTITION BY source
                ORDER BY difficulty_ppm ASC, doc_id ASC) - 1) * 4
              {div} count(*) OVER (PARTITION BY source)) AS INT) AS stage
  FROM per_doc
)
SELECT source, stage,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(difficulty_ppm) {div} count(*) AS BIGINT)
           AS mean_difficulty_ppm,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM staged
GROUP BY source, stage
ORDER BY source, stage
"""


def _q_curriculum_stages(spark, sf_dir):
    from .sqlrun import _run as _run_sql

    return _run_sql(_curriculum_sql("spark"), ("documents",))(spark, sf_dir)


QUERIES["docs_curriculum_stages"] = _q_curriculum_stages
ORACLES["docs_curriculum_stages"] = _curriculum_sql("duck")


# ------------------------------------------- shuffle resume slice
# Deterministic training RESUME (round 12): a preempted run at global
# step S must reproduce the exact upcoming batches without replaying
# the epoch permutation from step 0 — the property data loaders get
# from seed+skip and a distributed engine gets from a rank filter
# over the SAME hash permutation docs_epoch_shuffle gates. Position =
# global rank in (shard, sort_key, doc_id) order, computed scalably
# via the W1 exclusive prefix sum (range repartition + per-partition
# cumsum + broadcast offsets — no single-task global window); the
# oracle uses the one-level row_number a fixture-scale engine can
# afford. The slice filter sits UNDER the rank attachment, so at
# 100 TB only the K*B requested rows survive to the driver-facing
# result while the rank pass stays one linear scan.

RESUME_STEP = 7     # resume at global step 7
RESUME_BATCH = 32   # docs per step
RESUME_NBATCH = 3   # reproduce the next 3 batches


def _q_shuffle_resume_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .textops import exclusive_prefix_sum

    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    perm = spark.sql(f"""
        SELECT doc_id,
               CAST(k % {EPOCH_SHARDS} AS INT) AS shard,
               k AS sort_key
        FROM (
          SELECT doc_id,
                 CAST(conv(substr(md5(concat('epoch{EPOCH}:',
                        CAST(doc_id AS STRING))), 1, 15), 16, 10)
                      AS BIGINT) AS k
          FROM documents
        )
    """).withColumn("one", F.lit(1).cast("bigint"))
    lo = RESUME_STEP * RESUME_BATCH
    hi = (RESUME_STEP + RESUME_NBATCH) * RESUME_BATCH
    ranked = exclusive_prefix_sum(
        perm, ["shard", "sort_key", "doc_id"], "one", out_col="pos"
    )
    return (
        ranked.filter((F.col("pos") >= lo) & (F.col("pos") < hi))
        .select(
            (F.col("pos") / RESUME_BATCH).cast("int").alias("step"),
            (F.col("pos") % RESUME_BATCH).cast("int").alias("pos_in_batch"),
            "doc_id",
            "shard",
        )
        .orderBy("step", "pos_in_batch")
    )


SHUFFLE_RESUME_DUCK = f"""
WITH perm AS (
  SELECT doc_id,
         CAST(k % {EPOCH_SHARDS} AS INT) AS shard,
         k AS sort_key
  FROM (
    SELECT doc_id,
           CAST(concat('0x', substr(md5(concat('epoch{EPOCH}:',
                  CAST(doc_id AS VARCHAR))), 1, 15))
                AS BIGINT) AS k
    FROM documents
  )
),
pos AS (
  SELECT doc_id, shard,
         row_number() OVER (ORDER BY shard, sort_key, doc_id) - 1 AS p
  FROM perm
)
SELECT CAST(p // {RESUME_BATCH} AS INT) AS step,
       CAST(p % {RESUME_BATCH} AS INT) AS pos_in_batch,
       doc_id, shard
FROM pos
WHERE p >= {RESUME_STEP * RESUME_BATCH}
  AND p < {(RESUME_STEP + RESUME_NBATCH) * RESUME_BATCH}
ORDER BY step, pos_in_batch
"""

QUERIES["docs_shuffle_resume_slice"] = _q_shuffle_resume_slice
ORACLES["docs_shuffle_resume_slice"] = SHUFFLE_RESUME_DUCK


# ------------------------------------- deterministic mixture interleave
# Round 13: recipe.py plans per-source QUOTAS; the reader still needs
# the actual ORDER in which a mixture is served — the deterministic
# stride interleave (T5/GLaM-style mixing): each source's docs get a
# seeded per-source shuffle rank r, an interleave key
# k = r * 1e6 DIV share_ppm (the position a proportional stream would
# serve the source's r-th doc), and the global serve order sorts by
# (k, source, r). Any prefix of the schedule then holds each source
# ~proportionally to its share — no RNG at read time, resumable at
# any position (the shuffle-resume property), identical on any
# cluster. Both global orders ride exclusive_prefix_sum (the W1
# scalable-rank machinery), NEVER an unpartitioned window; the
# oracle keeps the one-level row_number spelling, so the gate also
# proves the two-pass rank == the global window on the fixture.

_MIX_DRAW_SPARK = (
    "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':mix')),"
    " 1, 15), 16, 10) AS BIGINT)"
)
_MIX_DRAW_DUCK = (
    "CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),"
    " ':mix')), 1, 15)) AS BIGINT)"
)


def _q_mixture_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .textops import exclusive_prefix_sum

    base = catalog.load_table(spark, sf_dir, "documents")
    # corpus total from the narrow parquet count, NOT a count() over
    # the prefix-sum plan (review r13 #6: that re-ran the whole rank
    # stage just to size share_ppm)
    tot = base.count()
    docs = base.select(
        "doc_id", "source", F.expr(_MIX_DRAW_SPARK).alias("h")
    ).withColumn("_one", F.lit(1).cast("long"))
    # per-source rank via ONE global prefix sum ordered (source, h,
    # doc_id) minus broadcast per-source starts (the
    # length_bucket_packing pattern)
    ranked = exclusive_prefix_sum(
        docs, ["source", "h", "doc_id"], "_one", out_col="_g"
    )
    starts = ranked.groupBy("source").agg(F.min("_g").alias("_start"))
    # int64-safe ppm arithmetic (r13 ADVICE): both the share division
    # and the interleave key split *1e6 into *1000 twice via
    # _scaled_div, so no intermediate forms t*1e6. share: exact under
    # its t<=w share bound. key k = src_rank*1e6 DIV share: the same
    # split is exact for ANY t; its bounds are src_rank*1000 < 2^63
    # (rank < 9.2e15 — beyond any per-source doc count; the old
    # single-product form overflowed at 9.2e12) and the RESULT k
    # itself fitting int64, which holds whenever the corpus-scale
    # serve position does.
    from .corpusstats import _scaled_div

    shares = (
        ranked.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
        .select(
            "source",
            F.expr(
                f"greatest({_scaled_div('_n', 1000, 1000, str(tot), 'DIV')},"
                " 1)"
            ).alias("share_ppm"),
        )
    )
    keyed = (
        ranked.join(F.broadcast(starts), "source")
        .join(F.broadcast(shares), "source")
        .select(
            "doc_id",
            "source",
            (F.col("_g") - F.col("_start") + 1).alias("src_rank"),
            F.expr(
                _scaled_div("_g - _start + 1", 1000, 1000,
                            "share_ppm", "DIV")
            ).alias("k"),
        )
        .withColumn("_one", F.lit(1).cast("long"))
    )
    out = exclusive_prefix_sum(
        keyed, ["k", "source", "src_rank"], "_one", out_col="_sp"
    )
    return out.select(
        (F.col("_sp") + 1).cast("long").alias("serve_pos"),
        "doc_id",
        "source",
        F.col("src_rank").cast("long").alias("src_rank"),
        F.col("k").cast("long").alias("k"),
    )


MIXTURE_INTERLEAVE_DUCK = f"""
WITH draws AS (
  SELECT doc_id, source, {_MIX_DRAW_DUCK} AS h FROM documents
),
tot AS (SELECT count(*) AS n FROM draws),
shares AS (
  SELECT source,
         greatest(count(*) * 1000000 // (SELECT n FROM tot), 1)
             AS share_ppm
  FROM draws GROUP BY source
),
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
             AS src_rank
  FROM draws
),
keyed AS (
  SELECT r.doc_id, r.source, r.src_rank,
         r.src_rank * 1000000 // s.share_ppm AS k
  FROM ranked r JOIN shares s ON s.source = r.source
)
SELECT CAST(row_number() OVER (ORDER BY k, source, src_rank) AS BIGINT)
           AS serve_pos,
       doc_id, source,
       CAST(src_rank AS BIGINT) AS src_rank,
       CAST(k AS BIGINT) AS k
FROM keyed
"""

QUERIES["docs_mixture_interleave"] = _q_mixture_interleave
ORACLES["docs_mixture_interleave"] = MIXTURE_INTERLEAVE_DUCK
