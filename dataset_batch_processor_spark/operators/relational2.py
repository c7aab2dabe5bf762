"""Extended relational surface: set ops, semi/anti joins, rollup,
sessionization, quantiles, date/string function coverage.

Complements operators/relational.py so the engine covers the full
"standard relational surface" the north star requires (SURVEY.md
§2.6-2.8 note every one of these is absent from the reference and
free in Spark). Each query is dialect-parallel with its DuckDB oracle;
integer-exact arithmetic (unix_micros, decimal sums, int ratios) keeps
the value hashes identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog

SESSION_GAP_US = 1_800_000_000  # 30 min in microseconds


def _run(sql: str, tables: tuple[str, ...]):
    def f(spark: SparkSession, sf_dir: str) -> DataFrame:
        for t in tables:
            catalog.load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(sql)

    return f


# --------------------------------------------------- semi / anti joins

ANTI_JOIN_SPARK = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""

SEMI_JOIN_SPARK = """
SELECT c_mktsegment, count(*) AS n_active_customers
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

# ------------------------------------------------------------- set ops

SET_OPS_SPARK = """
SELECT p_partkey FROM (
  SELECT l_partkey AS p_partkey FROM lineitem
  WHERE year(l_shipdate) = 1996
  INTERSECT
  SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = 1997
)
EXCEPT
SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = 1998
"""

SET_OPS_DUCK = SET_OPS_SPARK  # dialect-identical

# -------------------------------------------------------------- rollup

ROLLUP_SPARK = """
SELECT p_brand, p_type, count(*) AS n_parts,
       CAST(grouping(p_brand) AS INT) AS g_brand,
       CAST(grouping(p_type) AS INT) AS g_type
FROM part
GROUP BY ROLLUP (p_brand, p_type)
"""

ROLLUP_DUCK = ROLLUP_SPARK  # dialect-identical

# ---------------------------------------------------- conditional pivot

PIVOT_SPARK = """
SELECT o_orderstatus,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
       CAST(sum(CASE WHEN o_orderpriority = '2-HIGH'   THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_other,
       count(*) AS n_total
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

PIVOT_DUCK = PIVOT_SPARK

# -------------------------------------------------------- sessionization
# Event-time sessions per user with a 30-min inactivity gap — the
# batch form of a streaming session window. All arithmetic in integer
# microseconds (unix_micros/epoch_us) so both engines agree exactly.

SESSIONIZE_SPARK = f"""
WITH ev AS (
  SELECT user_id, unix_micros(ts) AS ts_us FROM events
),
flagged AS (
  SELECT user_id, ts_us,
         CASE WHEN ts_us - lag(ts_us) OVER w > {SESSION_GAP_US}
              OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
),
sessions AS (
  SELECT user_id, ts_us,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id,
         CAST(max(ts_us) - min(ts_us) AS BIGINT) AS session_len_us,
         count(*) AS n_events
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id,
       count(*) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       max(session_len_us) AS max_session_us
FROM per_session
GROUP BY user_id
"""

SESSIONIZE_DUCK = SESSIONIZE_SPARK.replace("unix_micros(ts)", "epoch_us(ts)")


# ------------------------------------------------ path transitions
# Product-analytics path mining, step one: the event-type transition
# matrix (what users do NEXT after each action — the edge weights a
# sankey/flow view renders). One user-keyed window (scale-safe: the
# partition key is user_id, never global) + a small-key count;
# deterministic total order via (ts_us, event_id) so simultaneous
# events cannot flip transitions between engines. Top 20 with a full
# tie-break.

PATH_TRANSITIONS_SPARK = """
WITH ev AS (
  SELECT user_id, event_type, unix_micros(ts) AS ts_us, event_id
  FROM events
),
seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS prev_type
  FROM ev
)
SELECT prev_type,
       event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n_transitions
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
ORDER BY n_transitions DESC, prev_type, next_type
LIMIT 20
"""

PATH_TRANSITIONS_DUCK = PATH_TRANSITIONS_SPARK.replace(
    "unix_micros(ts)", "epoch_us(ts)"
)

# ------------------------------------------------------------ quantiles

QUANTILES_SPARK = """
SELECT l_returnflag,
       round(percentile(l_quantity, 0.5), 6) AS median_qty,
       round(percentile(l_quantity, 0.9), 6) AS p90_qty,
       round(percentile(l_extendedprice, 0.5), 6) AS median_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

QUANTILES_DUCK = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
       round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# --------------------------------------------------------- date parts

DATE_PARTS_SPARK = """
SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
FROM orders
GROUP BY year(o_orderdate), quarter(o_orderdate)
ORDER BY yr, qtr
"""

DATE_PARTS_DUCK = """
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
FROM orders
GROUP BY 1, 2
ORDER BY yr, qtr
"""

# ------------------------------------------------------ string functions

STRINGS_SPARK = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       length(p_name) AS name_len,
       substring_index(p_name, ' ', 1) AS first_word,
       element_at(split(p_name, ' '), -1) AS last_word,
       levenshtein(substring_index(p_name, ' ', 1),
                   element_at(split(p_name, ' '), -1)) AS lev_first_last,
       md5(p_name) AS name_md5
FROM part
"""

STRINGS_DUCK = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       CAST(length(p_name) AS INT) AS name_len,
       split_part(p_name, ' ', 1) AS first_word,
       list_extract(string_split(p_name, ' '), len(string_split(p_name, ' ')))
           AS last_word,
       CAST(levenshtein(split_part(p_name, ' ', 1),
                   list_extract(string_split(p_name, ' '),
                                len(string_split(p_name, ' ')))) AS INT)
           AS lev_first_last,
       md5(p_name) AS name_md5
FROM part
"""

# --------------------------------------------------- BPE-ish tokenizing
# Subword-style tokenization via regex classes (letters runs / digits /
# punctuation singletons) — the cheap stand-in for BPE used to estimate
# token budgets in corpus curation.

BPE_SPARK = r"""
SELECT doc_id,
       CAST(size(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\\s]', 0)) AS BIGINT) AS n_bpe_tokens,
       CAST(size(array_distinct(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\\s]', 0)))
            AS BIGINT) AS n_distinct_bpe
FROM documents
"""

BPE_DUCK = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\s]')) AS n_bpe_tokens,
       len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\s]')))
           AS n_distinct_bpe
FROM documents
"""

# ------------------------------------------------- embedding near-dups
# LSH-bucketed near-duplicate pairs verified by exact cosine — the
# embedding analogue of MinHash→Jaccard (dedup.py). Threshold 0.35 is
# calibrated to the synthetic corpus (max pairwise cosine ≈ 0.51);
# real deployments use ~0.95 on purpose-built embeddings.

NEAR_DUP_T = 0.35


def _q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs = the shared candidate base filtered at the
    calibrated threshold. One construction of the LSH candidate set
    serves this query, the threshold histogram, and (through it) the
    near-dup component graph — the session-sharing convention every
    other pair-graph family follows."""
    from pyspark.sql import functions as F

    return _q_emb_near_dup_all(spark, sf_dir).filter(
        F.col("cos_sim") >= NEAR_DUP_T
    )


EMB_NEAR_DUP_DUCK = f"""
WITH planes AS (
  SELECT CAST(t AS INT) AS t, CAST(i AS INT) AS i,
         (CAST(concat('0x', substr(md5(concat(t, ':', i)), 1, 1)) AS INT) % 2) * 2 - 1
             AS sgn
  FROM (SELECT unnest(generate_series(0, 7)) AS t),
       (SELECT unnest(generate_series(1, 64)) AS i)
),
sigs AS (
  SELECT e.vec_id,
         CAST(sum(CASE WHEN proj > 0 THEN CAST(pow(2, t) AS INT) ELSE 0 END) AS INT)
             AS bucket
  FROM (
    SELECT e.vec_id, p.t,
           sum(CAST(e.embedding[p.i] AS DOUBLE) * p.sgn) AS proj
    FROM embeddings e, planes p
    GROUP BY e.vec_id, p.t
  ) e
  GROUP BY e.vec_id
),
bucketed AS (
  SELECT e.vec_id, e.embedding, s.bucket
  FROM embeddings e JOIN sigs s ON e.vec_id = s.vec_id
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.embedding AS emb_a, b.embedding AS emb_b
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
scored AS (
  SELECT vec_a, vec_b,
         round(
           list_sum(list_transform(generate_series(1, 64),
                    i -> CAST(emb_a[i] AS DOUBLE) * CAST(emb_b[i] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(generate_series(1, 64),
                    i -> CAST(emb_a[i] AS DOUBLE) * CAST(emb_a[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(generate_series(1, 64),
                    i -> CAST(emb_b[i] AS DOUBLE) * CAST(emb_b[i] AS DOUBLE))))),
           6) AS cos_sim
  FROM pairs
)
SELECT vec_a, vec_b, cos_sim FROM scored WHERE cos_sim >= {NEAR_DUP_T}
"""


# --------------------------------- near-dup threshold histogram
# The tuning table behind every "what EPS should I dedup at" decision:
# candidate-pair counts per cosine bin (0.05-wide), over the SAME
# LSH-bucketed candidate set the pair query uses — so the histogram
# reads directly as "how many pairs each threshold would remove".
# Bin arithmetic is floor(cos*20) on the ALREADY-ROUNDED cos_sim both
# engines share bit-identically, so bin edges cannot flake. 100-TB
# posture: identical to emb_near_dup_pairs (banded candidates, never
# all-pairs) plus one small-key aggregation.


def _q_emb_threshold_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    pairs = _q_emb_near_dup_all(spark, sf_dir)
    return (
        pairs.withColumn(
            "cos_bin",
            (F.floor(F.col("cos_sim") * 20) / 20).cast("double"),
        )
        .groupBy("cos_bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("cos_bin")
    )


def _q_emb_near_dup_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scored LSH candidate pairs WITHOUT the final threshold —
    the ONE physical construction behind the pair query
    (>= NEAR_DUP_T), the threshold histogram (all bins), and the
    component graph. Materialized once per session (matcache), so
    every consumer probes a scratch-parquet scan instead of re-running
    the bucket self-join — the same convention the dHash/pHash pair
    graphs follow. 100-TB posture: one banded self-join per session;
    the materialized result is candidate-pair-sized (banded, never
    all-pairs), and downstream filters/aggs prune on the scan."""
    from pyspark.sql import functions as F

    from ..functions import vector
    from ..matcache import materialize_once
    from .similarity import lsh_signature

    def build() -> DataFrame:
        emb = catalog.load_table(spark, sf_dir, "embeddings")
        b = emb.withColumn("bucket", lsh_signature(F.col("embedding")))
        left = b.select(
            F.col("vec_id").alias("vec_a"),
            F.col("embedding").alias("emb_a"),
            "bucket",
        )
        right = b.select(
            F.col("vec_id").alias("vec_b"),
            F.col("embedding").alias("emb_b"),
            F.col("bucket").alias("bucket_b"),
        )
        pairs = left.join(
            right,
            (F.col("bucket") == F.col("bucket_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        cos = F.round(vector.cosine(F.col("emb_a"), F.col("emb_b")), 6)
        return pairs.select("vec_a", "vec_b", cos.alias("cos_sim"))

    return materialize_once(spark, "embnd_cands", sf_dir, build)


EMB_THRESHOLD_HIST_DUCK = (
    EMB_NEAR_DUP_DUCK.replace(
        f"SELECT vec_a, vec_b, cos_sim FROM scored "
        f"WHERE cos_sim >= {NEAR_DUP_T}",
        """SELECT CAST(floor(cos_sim * 20) / 20 AS DOUBLE) AS cos_bin,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM scored
GROUP BY 1
ORDER BY cos_bin""",
    )
)


QUERIES = {
    "customers_without_orders": _run(ANTI_JOIN_SPARK, ("customer", "orders")),
    "active_customers_semi": _run(SEMI_JOIN_SPARK, ("customer", "orders")),
    "partkey_set_ops": _run(SET_OPS_SPARK, ("lineitem",)),
    "brand_type_rollup": _run(ROLLUP_SPARK, ("part",)),
    "priority_pivot": _run(PIVOT_SPARK, ("orders",)),
    "events_sessionize": _run(SESSIONIZE_SPARK, ("events",)),
    "events_path_transitions": _run(PATH_TRANSITIONS_SPARK, ("events",)),
    "lineitem_quantiles": _run(QUANTILES_SPARK, ("lineitem",)),
    "orders_date_parts": _run(DATE_PARTS_SPARK, ("orders",)),
    "part_string_funcs": _run(STRINGS_SPARK, ("part",)),
    "docs_bpe_tokens": _run(BPE_SPARK, ("documents",)),
    "emb_near_dup_pairs": _q_emb_near_dup,
    "emb_near_dup_threshold_hist": _q_emb_threshold_hist,
}

ORACLES = {
    "customers_without_orders": ANTI_JOIN_SPARK,
    "active_customers_semi": SEMI_JOIN_SPARK,
    "partkey_set_ops": SET_OPS_DUCK,
    "brand_type_rollup": ROLLUP_DUCK,
    "priority_pivot": PIVOT_DUCK,
    "events_sessionize": SESSIONIZE_DUCK,
    "events_path_transitions": PATH_TRANSITIONS_DUCK,
    "lineitem_quantiles": QUANTILES_DUCK,
    "orders_date_parts": DATE_PARTS_DUCK,
    "part_string_funcs": STRINGS_DUCK,
    "docs_bpe_tokens": BPE_DUCK,
    "emb_near_dup_pairs": EMB_NEAR_DUP_DUCK,
    "emb_near_dup_threshold_hist": EMB_THRESHOLD_HIST_DUCK,
}
