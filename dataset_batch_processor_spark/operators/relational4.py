"""Fourth relational wave: the remaining TPC-H query shapes the
fixture schema can express.

The driver's tables are reduced TPC-H (no partsupp, no
l_shipmode/commitdate/receiptdate, no c_phone/o_comment), so q2/q11/
q16/q20 (partsupp-bound) and the shipmode/comment filters are out of
reach; every other distinctive plan shape lands here, adapted to the
available columns but keeping the canonical join/agg/subquery
structure:

- q8  market share: two-level ratio of conditional decimal sums over a
  six-table snowflake by year.
- q9  product-type profit: LIKE-filtered part join, profit rollup by
  supplier nation x year.
- q13 order-count distribution: LEFT join + two-level aggregation
  (count-of-counts) — the classic skew-tolerant double groupBy.
- q14 promo effect: single-pass conditional-numerator ratio.
- q17 small-quantity revenue: per-part correlated average (windowed
  pre-agg formulation, not a rescan).
- q18 large-volume customers: HAVING-filtered semi join back to the
  fact.
- q19 disjunctive predicate: OR-of-ANDs that Catalyst must keep
  pushdown-friendly.
- q22 inactive high-balance customers: scalar subquery threshold +
  anti join.
- q15 top supplier: revenue view + scalar-max equality join
  (ties kept).

All queries run the SAME SQL text on Spark and DuckDB unless a
dialect note says otherwise; decimal-exact accumulation + explicit
casts keep value hashes identical (see MEMORY's determinism rules).
"""

from __future__ import annotations

from .relational2 import _run

Q8_SPARK = """
SELECT o_year,
       CAST(round(nation_volume / total_volume, 6) AS DOUBLE) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                       THEN CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(25,6))
                       ELSE CAST(0 AS DECIMAL(25,6)) END)
              AS DOUBLE) AS nation_volume,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(25,6))) AS DOUBLE) AS total_volume
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN part     ON p_partkey = l_partkey
  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
  GROUP BY year(o_orderdate)
)
ORDER BY o_year
"""

Q8_DUCK = Q8_SPARK.replace(
    "SELECT o_year,", "SELECT CAST(o_year AS INT) AS o_year,"
)

Q9_SPARK = """
SELECT n_name AS nation, o_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(25,6))) AS DOUBLE) AS profit
FROM (
  SELECT n_name, year(o_orderdate) AS o_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN part     ON p_partkey = l_partkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%ol%'
)
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
"""

Q9_DUCK = Q9_SPARK.replace(
    "year(o_orderdate) AS o_year",
    "CAST(year(o_orderdate) AS INT) AS o_year",
)

Q13_SPARK = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

Q14_SPARK = """
SELECT CAST(round(
         100.00 * promo_revenue / total_revenue, 6) AS DOUBLE)
           AS promo_pct
FROM (
  SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                       THEN CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(25,6))
                       ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
             AS promo_revenue,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(25,6))) AS DOUBLE) AS total_revenue
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE year(l_shipdate) = 1996 AND month(l_shipdate) = 9
)
"""

# q17: revenue from orders of < 50% of the part's average quantity.
# Canonical form rescans lineitem in a correlated subquery; the
# windowed formulation computes the per-part average in the SAME scan
# — the plan a 100 TB deployment wants (one shuffle on l_partkey).
Q17_SPARK = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
             / 7.0, 6) AS avg_yearly,
       count(*) AS n_lines
FROM (
  SELECT l_extendedprice
  FROM (
    SELECT l_extendedprice, l_quantity,
           avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#11'
  )
  WHERE l_quantity < 0.5 * avg_qty
)
"""

Q18_SPARK = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > 200
)
GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""

Q19_SPARK = """
SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
"""

# q22: "country code" adapted to nationkey % 10. Every fixture
# customer has at least one order, so the canonical "no orders at all"
# anti join is vacuous; the adapted predicate — no order above 300k —
# keeps the same scalar-subquery + NOT EXISTS plan shape with a
# non-empty result.
Q22_SPARK = """
SELECT cntrycode, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS totacctbal
FROM (
  SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode, c_acctbal
  FROM customer
  WHERE c_acctbal > (
          SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0
        )
    AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 300000
        )
)
GROUP BY cntrycode
ORDER BY cntrycode
"""

# q15: top supplier(s) by quarterly revenue — the canonical
# view + scalar-max + equality join (ties kept) shape.
Q15_SPARK = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(25,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""

# q21: suppliers who kept orders waiting — adapted to the fixture
# (no commit/receipt dates: "late" = shipped > 90 days after the
# order date). Deliberately the SCALABLE rewrite: instead of the
# canonical correlated EXISTS / NOT EXISTS pair (two extra rescans of
# the fact), lateness is aggregated once per (order, supplier) and
# once per order, then the "only late supplier in a multi-supplier
# order" predicate is a filter over two map-side-combinable groupBys
# — same semantics, one pass over lineitem.
Q21_SPARK = """
WITH ol AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
),
per_supp AS (
  SELECT l_orderkey, l_suppkey, max(late) AS supp_late
  FROM ol GROUP BY l_orderkey, l_suppkey
),
per_order AS (
  SELECT l_orderkey,
         count(*) AS n_supps,
         sum(supp_late) AS n_late
  FROM per_supp GROUP BY l_orderkey
)
SELECT s_name, count(*) AS numwait
FROM per_supp
JOIN per_order USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE supp_late = 1 AND n_supps > 1 AND n_late = 1
  AND n_name = 'NATION_1'
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""

QUERIES = {
    "q8_market_share": _run(
        Q8_SPARK,
        ("lineitem", "orders", "customer", "nation", "region", "supplier",
         "part"),
    ),
    "q9_product_profit": _run(
        Q9_SPARK, ("lineitem", "supplier", "part", "orders", "nation")
    ),
    "q13_order_distribution": _run(Q13_SPARK, ("customer", "orders")),
    "q14_promo_effect": _run(Q14_SPARK, ("lineitem", "part")),
    "q17_small_qty_revenue": _run(Q17_SPARK, ("lineitem", "part")),
    "q18_large_volume": _run(Q18_SPARK, ("customer", "orders", "lineitem")),
    "q19_disjunctive": _run(Q19_SPARK, ("lineitem", "part")),
    "q22_inactive_high_balance": _run(Q22_SPARK, ("customer", "orders")),
    "q15_top_supplier": _run(Q15_SPARK, ("lineitem", "supplier")),
    "q21_waiting_suppliers": _run(
        Q21_SPARK, ("lineitem", "orders", "supplier", "nation")
    ),
}

ORACLES = {
    "q8_market_share": Q8_DUCK,
    "q9_product_profit": Q9_DUCK,
    "q13_order_distribution": Q13_SPARK,
    "q14_promo_effect": Q14_SPARK,
    "q17_small_qty_revenue": Q17_SPARK,
    "q18_large_volume": Q18_SPARK,
    "q19_disjunctive": Q19_SPARK,
    "q22_inactive_high_balance": Q22_SPARK,
    "q15_top_supplier": Q15_SPARK,
    "q21_waiting_suppliers": Q21_SPARK,
}
