"""Snapshot merge (upsert) — the batch MERGE INTO pattern.

Lakehouse tables (Delta/Iceberg/Hudi) expose MERGE as a primitive;
on plain parquet the same semantics are one FULL OUTER join + field
coalesce, rewritten as a new snapshot:

- matched rows take the update's values (updated_at bumps),
- unmatched-left rows pass through unchanged,
- unmatched-right rows are inserts.

Scale: the join shuffles both sides on the key once — exactly what a
lakehouse MERGE does under the hood (minus file-level skipping, which
belongs to the table format, not the operator). For dim-sized updates
Catalyst broadcasts the update side automatically; the snapshot
rewrite is append-only (immutable outputs, K9 guard discipline).

The driver query derives a deterministic change set FROM the fixture
itself (every 7th customer gets an acctbal adjustment; 5 synthetic
new customers), so both engines see the same inputs and the merged
snapshot is hash-comparable. This also covers the FULL OUTER JOIN
plan shape, which no other registered query exercises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog


def merge_snapshot(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    update_cols: list[str],
) -> DataFrame:
    """New snapshot = base MERGE updates on ``key``.

    ``updates`` must carry ``key`` + ``update_cols``; all other base
    columns pass through (NULL for pure inserts)."""
    u = updates.select(
        F.col(key).alias("_uk"),
        *[F.col(c).alias(f"_u_{c}") for c in update_cols],
    )
    joined = base.join(u, base[key] == u["_uk"], "full_outer")
    passthrough = [c for c in base.columns if c != key and c not in update_cols]
    return joined.select(
        F.coalesce(base[key], F.col("_uk")).alias(key),
        *[
            F.coalesce(F.col(f"_u_{c}"), base[c]).alias(c)
            for c in update_cols
        ],
        *[base[c].alias(c) for c in passthrough],
    )


def _q_customer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = catalog.load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    # deterministic change set: every 7th customer gets +100.5 balance;
    # 5 brand-new keys above the current max key space (fixture keys are
    # dense from 1, so 10^9+i is safely fresh at every SF).
    changed = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + F.lit(100.5)).alias("c_acctbal"),
        F.lit("MERGED").alias("c_mktsegment"),
    )
    inserts = spark.range(1, 6).select(
        (F.col("id") + F.lit(1_000_000_000)).alias("c_custkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    updates = changed.unionByName(inserts)
    merged = merge_snapshot(
        cust, updates, key="c_custkey", update_cols=["c_acctbal", "c_mktsegment"]
    )
    return merged.select(
        "c_custkey",
        F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
        "c_mktsegment",
        "c_name",
        "c_nationkey",
    ).orderBy("c_custkey")


CUSTOMER_MERGE_DUCK = """
WITH updates AS (
  SELECT c_custkey, c_acctbal + 100.5 AS c_acctbal,
         'MERGED' AS c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT 1000000000 + i, 0.0, 'NEW'
  FROM (SELECT unnest(generate_series(1, 5)) AS i)
)
SELECT coalesce(b.c_custkey, u.c_custkey) AS c_custkey,
       round(coalesce(u.c_acctbal, b.c_acctbal), 2) AS c_acctbal,
       coalesce(u.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
       b.c_name,
       b.c_nationkey
FROM customer b FULL OUTER JOIN updates u ON b.c_custkey = u.c_custkey
ORDER BY c_custkey
"""


QUERIES = {
    "customer_upsert_merge": _q_customer_merge,
}
ORACLES = {
    "customer_upsert_merge": CUSTOMER_MERGE_DUCK,
}
