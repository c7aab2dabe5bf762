"""Count-min sketch: mergeable heavy-hitter counting.

The third sketch family (HLL distinct counts and KLL-style quantiles
live in setops.py/windows.py): a D x W integer counter grid where
every observation increments one counter per hash row, and a key's
estimate is the MIN of its D counters (Cormode & Muthukrishnan).
The two properties that matter at 100 TB:

- **mergeable**: CMS(A ∪ B) = CMS(A) + CMS(B) element-wise, so
  partial sketches combine associatively across partitions, days, or
  micro-batches — the same reason HLL is the production distinct
  counter. ``accumulate_cms`` below is exactly that: per-micro-batch
  partial grids committed idempotently (overwrite-by-batch_id, the
  incremental-LSH pattern), summed on read; the batch grid and the
  drained streaming grid are equal INTEGER BY INTEGER, which the
  parity test pins.
- **never underestimates**: est >= exact always. The heavy-hitters
  query carries that invariant as a boolean column, so the driver's
  hash gate re-proves it on every run (the distinct_sketches
  error-bound pattern).

Everything is exact integer arithmetic on md5-derived hashes — both
engines compute identical grids, no estimation noise to absorb.

Scale shape: the grid build is one narrow 4x explode + a groupBy over
a key space of AT MOST D*W = 256 cells (map-side combine does almost
all the work); the heavy-hitter estimate joins the bounded
(distinct-key x D) relation against the 256-cell grid — broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog

CMS_D = 4   # hash rows
CMS_W = 64  # counters per row
HH_THRESH = 80


def _col_spark(key_expr: str) -> str:
    return (
        f"CAST(CAST(conv(substr(md5(concat('cms', CAST(i AS STRING), ':', "
        f"{key_expr})), 1, 15), 16, 10) AS BIGINT) % {CMS_W} AS INT)"
    )


def _col_duck(key_expr: str) -> str:
    return (
        f"CAST(CAST(concat('0x', substr(md5(concat('cms', CAST(i AS VARCHAR),"
        f" ':', {key_expr})), 1, 15)) AS BIGINT) % {CMS_W} AS INT)"
    )


CMS_COUNTERS_SPARK = f"""
SELECT CAST(i AS INT) AS row_idx, col, CAST(count(*) AS BIGINT) AS counter
FROM (
  SELECT i, {_col_spark("CAST(user_id AS STRING)")} AS col
  FROM events LATERAL VIEW explode(sequence(0, {CMS_D - 1})) t AS i
)
GROUP BY i, col
ORDER BY row_idx, col
"""

CMS_COUNTERS_DUCK = f"""
SELECT CAST(i AS INT) AS row_idx, col, CAST(count(*) AS BIGINT) AS counter
FROM (
  SELECT i, {_col_duck("CAST(user_id AS VARCHAR)")} AS col
  FROM (
    SELECT user_id, unnest(generate_series(0, {CMS_D - 1})) AS i
    FROM events
  )
)
GROUP BY i, col
ORDER BY row_idx, col
"""

_HH_TAIL = f"""
SELECT user_id, est, exact_cnt,
       est >= exact_cnt AS never_underestimates
FROM (
  SELECT user_id, exact_cnt, min(counter) AS est
  FROM uh
  JOIN counters ON uh.i = counters.row_idx AND uh.col = counters.col
  GROUP BY user_id, exact_cnt
)
WHERE est >= {HH_THRESH}
ORDER BY user_id
"""

CMS_HH_SPARK = f"""
WITH counters AS (
  SELECT CAST(i AS INT) AS row_idx, col, CAST(count(*) AS BIGINT) AS counter
  FROM (
    SELECT i, {_col_spark("CAST(user_id AS STRING)")} AS col
    FROM events LATERAL VIEW explode(sequence(0, {CMS_D - 1})) t AS i
  )
  GROUP BY i, col
),
users AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM events GROUP BY user_id
),
uh AS (
  SELECT user_id, exact_cnt, i,
         {_col_spark("CAST(user_id AS STRING)")} AS col
  FROM users LATERAL VIEW explode(sequence(0, {CMS_D - 1})) t AS i
)
{_HH_TAIL}
"""

CMS_HH_DUCK = f"""
WITH counters AS (
  SELECT CAST(i AS INT) AS row_idx, col, CAST(count(*) AS BIGINT) AS counter
  FROM (
    SELECT i, {_col_duck("CAST(user_id AS VARCHAR)")} AS col
    FROM (
      SELECT user_id, unnest(generate_series(0, {CMS_D - 1})) AS i
      FROM events
    )
  )
  GROUP BY i, col
),
users AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM events GROUP BY user_id
),
uh AS (
  SELECT user_id, exact_cnt, i,
         {_col_duck("CAST(user_id AS VARCHAR)")} AS col
  FROM (
    SELECT user_id, exact_cnt, unnest(generate_series(0, {CMS_D - 1})) AS i
    FROM users
  )
)
{_HH_TAIL}
"""


def _run_events(sql: str):
    def f(spark: SparkSession, sf_dir: str) -> DataFrame:
        catalog.load_table(spark, sf_dir, "events").createOrReplaceTempView(
            "events"
        )
        return spark.sql(sql)

    return f


# ------------------------------------------------ streaming accumulation


def cms_partial(events: DataFrame, production_hash: bool = False) -> DataFrame:
    """The (row_idx, col, counter) partial grid for one batch of
    events — the mergeable unit.

    ``production_hash`` swaps the oracle's md5 bucketing for Spark's
    xxhash64 (codegen-native, measured ~14x faster at 5M events in
    SCALE.md). Any single hash family is a valid CMS; md5 is kept as
    the default ONLY because DuckDB can reproduce it for the driver
    gate. Grids from the two hash families are not mergeable with
    each other — pick one per index."""
    col = (
        f"CAST(pmod(xxhash64(concat('cms', CAST(i AS STRING), ':', "
        f"CAST(user_id AS STRING))), {CMS_W}) AS INT)"
        if production_hash
        else _col_spark("CAST(user_id AS STRING)")
    )
    return (
        events.select("user_id")
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("i"),
            F.col("user_id"),
        )
        .select(
            F.col("i").alias("row_idx"),
            F.expr(col).alias("col"),
        )
        .groupBy("row_idx", "col")
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def accumulate_cms(events_stream: DataFrame, counters_dir: str,
                   checkpoint_dir: str):
    """foreachBatch CMS accumulation: each micro-batch commits its
    partial grid to ``counters_dir/batch_id=N`` (overwrite — a
    retried batch replaces its own partition instead of
    double-counting). Read the accumulated sketch back with
    :func:`read_cms`."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(counters_dir, f"batch_id={batch_id}")
        cms_partial(batch_df).write.mode("overwrite").parquet(out)

    return (
        events_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_cms(spark: SparkSession, counters_dir: str) -> DataFrame:
    """Merge the accumulated per-batch grids: element-wise sum."""
    return (
        spark.read.parquet(counters_dir)
        .groupBy("row_idx", "col")
        .agg(F.sum("counter").alias("counter"))
    )


QUERIES = {
    "events_cms_counters": _run_events(CMS_COUNTERS_SPARK),
    "events_cms_heavy_hitters": _run_events(CMS_HH_SPARK),
}
ORACLES = {
    "events_cms_counters": CMS_COUNTERS_DUCK,
    "events_cms_heavy_hitters": CMS_HH_DUCK,
}


# ------------------------------------------------- driver-gated stream
# Runs the WHOLE streaming accumulation loop inside one query (the
# docs_incremental_lsh_pairs precedent): stage the events in two
# chunks, drain an availableNow foreachBatch stream that commits one
# partial grid per micro-batch, merge on read. The result equals the
# one-pass batch grid by mergeability, so CMS_COUNTERS_DUCK hash-gates
# the micro-batching, the idempotent per-batch commits, and the merge.


def stage(spark: SparkSession, sf_dir: str) -> str:
    """Session-shared shard staging for the streaming CMS twin —
    exposed for bench warmup (round 16: the three operators-side
    twins were the only streams whose staging was not pre-built, so
    their first-touch timing carried fixture parquet writes)."""
    from ..streaming.fixtures import stage_expr_shards

    events = catalog.load_table(spark, sf_dir, "events").select("user_id")
    return stage_expr_shards(events, "cms_q", sf_dir, "user_id % 2")


def _q_cms_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..matcache import scratch_dir

    stage_path = stage(spark, sf_dir)

    work = scratch_dir("dbp_cms_work_")
    # micro-batch shuffles sized to the batch, not the session (the
    # round-15 drain discipline — this drain was missed by the first
    # pass); the merged grid is partitioning-invariant by
    # mergeability, which CMS_COUNTERS_DUCK re-proves.
    from ..streaming.fixtures import drain_sized

    with drain_sized(spark):
        q = accumulate_cms(
            spark.readStream.schema("user_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(stage_path),
            counters_dir=os.path.join(work, "counters"),
            checkpoint_dir=os.path.join(work, "ckpt"),
        )
        q.awaitTermination()
    return (
        read_cms(spark, os.path.join(work, "counters"))
        .select(
            F.col("row_idx").cast("int").alias("row_idx"),
            F.col("col").cast("int").alias("col"),
            F.col("counter").cast("bigint").alias("counter"),
        )
        .orderBy("row_idx", "col")
    )


QUERIES["events_cms_streaming_counters"] = _q_cms_streaming
ORACLES["events_cms_streaming_counters"] = CMS_COUNTERS_DUCK
