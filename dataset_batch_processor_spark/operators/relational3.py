"""Third relational wave: TPC-H Q7/Q10 shapes + approximate sketches.

Q7 (volume shipping) exercises a join where BOTH sides need a
dimension attribute before the fact join — the classic snowflake
pattern. Q10 is the returned-item report: selective fact filter, then
customer rollup + top-k.

The sketch query is rows-only (no oracle): Spark's HyperLogLog++ and
DuckDB's HLL produce different estimates by design; the query instead
carries its own ground truth (exact distinct counts) so the test can
bound the estimation error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from .relational2 import _run

NATION_A = "NATION_1"
NATION_B = "NATION_2"

Q7_SPARK = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(CAST(volume AS DECIMAL(25,6))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = '{NATION_A}' AND n2.n_name = '{NATION_B}')
     OR (n1.n_name = '{NATION_B}' AND n2.n_name = '{NATION_A}')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

Q7_DUCK = Q7_SPARK.replace(
    "year(l_shipdate) AS l_year", "CAST(year(l_shipdate) AS INT) AS l_year"
)

Q10_SPARK = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
            AS DOUBLE) AS revenue,
       count(*) AS n_returned_items
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

Q10_DUCK = Q10_SPARK


SKETCH_TOL = 0.05  # 2.5× the requested rsd=0.02 — comfortable, still real


def _q_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct-count sketches checked against ground truth.

    HLL++ estimates are engine-specific, so the raw estimate can't be
    hash-compared with DuckDB. Instead the query emits the EXACT counts
    plus a boolean asserting |approx - exact| <= tol * exact; the oracle
    emits the same exact counts with literal TRUE. A hash match therefore
    proves the sketch's error bound holds — a real check, not rows-only.
    (HLL++ is deterministic for a fixed dataset, so the booleans are
    stable across runs.)"""
    li = catalog.load_table(spark, sf_dir, "lineitem")
    est = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", 0.02).alias("_ap"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("_ao"),
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= F.col(e) * F.lit(SKETCH_TOL)
    )
    return est.select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        within("_ap", "exact_parts").alias("parts_within_tol"),
        within("_ao", "exact_orders").alias("orders_within_tol"),
    )


SKETCHES_DUCK = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       count(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS parts_within_tol,
       TRUE AS orders_within_tol
FROM lineitem
GROUP BY l_returnflag
"""


QUERIES = {
    "q7_volume_shipping": _run(
        Q7_SPARK, ("lineitem", "supplier", "orders", "customer", "nation")
    ),
    "q10_returned_items": _run(
        Q10_SPARK, ("customer", "orders", "lineitem", "nation")
    ),
    "distinct_sketches": _q_sketches,
}

ORACLES = {
    "q7_volume_shipping": Q7_DUCK,
    "q10_returned_items": Q10_DUCK,
    "distinct_sketches": SKETCHES_DUCK,
}


# ------------------------------------------------------- wave 2 queries

CUBE_SPARK = """
SELECT c_mktsegment, c_nationkey, count(*) AS n,
       CAST(grouping(c_mktsegment) AS INT) AS g_seg,
       CAST(grouping(c_nationkey) AS INT) AS g_nat
FROM customer
GROUP BY CUBE (c_mktsegment, c_nationkey)
"""

GROUPING_SETS_SPARK = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
"""

CORRELATED_SPARK = """
SELECT p_partkey, p_brand, p_retailprice
FROM part p
WHERE p_retailprice > (
  SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(25,6)))
              / count(*) AS DOUBLE)
  FROM part p2 WHERE p2.p_brand = p.p_brand
)
"""

UNION_SPARK = """
SELECT name, kind FROM (
  SELECT c_name AS name, 'customer' AS kind FROM customer
  UNION ALL
  SELECT s_name AS name, 'supplier' AS kind FROM supplier
)
"""

ORDER_GAPS_SPARK = """
SELECT o_custkey, o_orderkey,
       CAST(datediff(o_orderdate, prev_date) AS INT) AS gap_days
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS prev_date
  FROM orders
)
WHERE prev_date IS NOT NULL
"""

ORDER_GAPS_DUCK = """
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day', prev_date, o_orderdate) AS INT) AS gap_days
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS prev_date
  FROM orders
)
WHERE prev_date IS NOT NULL
"""

QUERIES.update(
    {
        "customer_cube": _run(CUBE_SPARK, ("customer",)),
        "lineitem_grouping_sets": _run(GROUPING_SETS_SPARK, ("lineitem",)),
        "parts_above_brand_avg": _run(CORRELATED_SPARK, ("part",)),
        "names_union_all": _run(UNION_SPARK, ("customer", "supplier")),
        "customer_order_gaps": _run(ORDER_GAPS_SPARK, ("orders",)),
    }
)
ORACLES.update(
    {
        "customer_cube": CUBE_SPARK,
        "lineitem_grouping_sets": GROUPING_SETS_SPARK,
        "parts_above_brand_avg": CORRELATED_SPARK,
        "names_union_all": UNION_SPARK,
        "customer_order_gaps": ORDER_GAPS_DUCK,
    }
)


# ------------------------------------------------- hierarchical rollup
# Hypertable-style continuous aggregate: the daily rollup is computed
# FROM the hourly rollup, not by rescanning raw events — the
# decimal-exact partials re-aggregate losslessly, so coarser grains
# are free once the finest grain is materialized. The oracle computes
# daily DIRECTLY from events; equality proves rollup-reuse validity.

def _q_daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = catalog.load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour_ts"), "event_type"
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("sum_value_dec"),
        )
    )
    daily = (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", "hour_ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_dec").cast("double").alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )
    return daily


DAILY_DIRECT_DUCK = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""

QUERIES["events_daily_from_hourly"] = _q_daily_from_hourly
ORACLES["events_daily_from_hourly"] = DAILY_DIRECT_DUCK


# ------------------------------------------------------- wave 3 queries

Q6_SPARK = """
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(25,6)))
            AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

Q4_SPARK = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# trailing 30-day per-customer order total: RANGE frame over epoch-day
TRAILING_SPARK = """
SELECT o_custkey, o_orderkey,
       CAST(sum(total_dec) OVER (
         PARTITION BY o_custkey ORDER BY d
         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_30d
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT) AS d,
         CAST(o_totalprice AS DECIMAL(25,6)) AS total_dec
  FROM orders
)
"""

TRAILING_DUCK = """
SELECT o_custkey, o_orderkey,
       CAST(sum(total_dec) OVER (
         PARTITION BY o_custkey ORDER BY d
         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_30d
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS d,
         CAST(o_totalprice AS DECIMAL(25,6)) AS total_dec
  FROM orders
)
"""

NTILE_SPARK = """
SELECT c_custkey, total_spent,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM (
  SELECT c_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_spent
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
WINDOW w AS (ORDER BY total_spent DESC, c_custkey)
"""

QUERIES.update(
    {
        "q6_forecast_revenue": _run(Q6_SPARK, ("lineitem",)),
        "q4_order_priority": _run(Q4_SPARK, ("orders", "lineitem")),
        "orders_trailing_30d": _run(TRAILING_SPARK, ("orders",)),
        "customer_value_ntiles": _run(NTILE_SPARK, ("customer", "orders")),
    }
)
ORACLES.update(
    {
        "q6_forecast_revenue": Q6_SPARK,
        "q4_order_priority": Q4_SPARK,
        "orders_trailing_30d": TRAILING_DUCK,
        "customer_value_ntiles": NTILE_SPARK,
    }
)


# ---------------------------------------------- percentile sketch query
# Approximate percentiles (Spark's KLL-style approx_percentile) share
# distinct_sketches' oracle problem: the estimate is engine-specific.
# Same solution: the sketch's guarantee is a RANK bound (rank error
# <= n/accuracy), so the query emits exact bracketing percentiles and
# booleans asserting exact_p(p-1%) <= approx_p(p) <= exact_p(p+1%);
# the oracle emits the same exact values with literal TRUE. A hash
# match proves the rank bound held. accuracy=10000 -> 0.01% rank
# error on the sketch, 100x inside the +-1% bracket asserted.


def _q_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = catalog.load_table(spark, sf_dir, "lineitem")
    est = li.groupBy("l_returnflag").agg(
        F.expr("round(percentile(l_extendedprice, 0.50), 6)").alias("exact_p50"),
        F.expr("round(percentile(l_extendedprice, 0.90), 6)").alias("exact_p90"),
        F.expr("percentile(l_extendedprice, 0.49)").alias("_lo50"),
        F.expr("percentile(l_extendedprice, 0.51)").alias("_hi50"),
        F.expr("percentile(l_extendedprice, 0.89)").alias("_lo90"),
        F.expr("percentile(l_extendedprice, 0.91)").alias("_hi90"),
        F.expr("approx_percentile(l_extendedprice, 0.50, 10000)").alias("_a50"),
        F.expr("approx_percentile(l_extendedprice, 0.90, 10000)").alias("_a90"),
    )
    bracket = lambda a, lo, hi: (  # noqa: E731
        (F.col(a) >= F.col(lo)) & (F.col(a) <= F.col(hi))
    )
    return est.select(
        "l_returnflag",
        "exact_p50",
        "exact_p90",
        bracket("_a50", "_lo50", "_hi50").alias("p50_within_rank_tol"),
        bracket("_a90", "_lo90", "_hi90").alias("p90_within_rank_tol"),
    )


PERCENTILE_SKETCH_DUCK = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS exact_p50,
       round(quantile_cont(l_extendedprice, 0.90), 6) AS exact_p90,
       TRUE AS p50_within_rank_tol,
       TRUE AS p90_within_rank_tol
FROM lineitem
GROUP BY l_returnflag
"""

QUERIES["value_percentiles_sketch"] = _q_percentile_sketch
ORACLES["value_percentiles_sketch"] = PERCENTILE_SKETCH_DUCK
