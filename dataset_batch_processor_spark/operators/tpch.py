"""The TPC-H query surface: every q-numbered shape the reduced
fixture schema can express, in one module (round 9 — consolidation of
the former relational3/4/6 waves, unchanged SQL).

The driver's tables are reduced TPC-H (no partsupp, no
l_shipmode/commitdate/receiptdate, no c_phone/o_comment), so the
partsupp-bound queries (q2/q11/q16/q20) derive a part→supplier
relation from ``lineitem`` (``GROUP BY l_partkey, l_suppkey``) and
``o_orderpriority`` classes stand in for shipmode; every distinctive
plan shape keeps its canonical join/agg/subquery structure:

- q2  min-cost supplier: multi-join + correlated scalar-MIN subquery
  (the classic decorrelation test).
- q4  order priority: range filter + correlated EXISTS.
- q6  forecast revenue: pure scan-side conjunctive predicate.
- q7  volume shipping: both sides need a dimension attribute before
  the fact join — the snowflake pattern.
- q8  market share: two-level ratio of conditional decimal sums over
  a six-table snowflake by year.
- q9  product-type profit: LIKE-filtered part join, profit rollup.
- q10 returned items: selective fact filter + customer rollup/top-k.
- q11 important stock: per-group value share vs global-total scalar.
- q12 priority class: join + two-way conditional counts.
- q13 order-count distribution: LEFT join + count-of-counts.
- q14 promo effect: single-pass conditional-numerator ratio.
- q15 top supplier: revenue view + scalar-max equality join (ties).
- q16 supplier count: COUNT(DISTINCT) + NOT IN anti-subquery.
- q17 small-quantity revenue: per-part correlated average, written as
  the windowed one-scan formulation (the plan 100 TB wants).
- q18 large-volume customers: HAVING-filtered semi join.
- q19 disjunctive predicate: OR-of-ANDs kept pushdown-friendly.
- q20 part promotion: nested IN + correlated half-of-sum threshold in
  exact DECIMAL.
- q21 waiting suppliers: the scalable two-groupBy rewrite of the
  correlated EXISTS / NOT EXISTS pair (one pass over lineitem).
- q22 inactive high-balance: scalar-subquery threshold + anti join.

All queries run the SAME SQL text on Spark and DuckDB unless a
dialect note says otherwise; decimal-exact accumulation + explicit
casts keep value hashes identical (see MEMORY's determinism rules).

At 100 TB: dimension joins broadcast; the derived ps CTE is one
map-side-combined shuffle on (l_partkey, l_suppkey); correlated
scalars decorrelate to aggregate + re-join (no per-row rescans).
"""

from __future__ import annotations

from .sqlrun import _run

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

# Round 15: Q21_SPARK references per_supp twice (per_order + the
# final join) and Spark inlines CTEs — the lineitem⋈orders chain ran
# twice. The per-order counts become windows PARTITIONED BY the same
# key the per_supp aggregation just hash-partitioned on, so they ride
# the existing exchange (guide §2.4) and per_supp evaluates once.
# Identical rows; the DuckDB oracle keeps the two-aggregate spelling.
Q21_SPARK_OPT = """
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
annotated AS (
  SELECT l_orderkey, l_suppkey, supp_late,
         count(*)       OVER (PARTITION BY l_orderkey) AS n_supps,
         sum(supp_late) OVER (PARTITION BY l_orderkey) AS n_late
  FROM per_supp
)
SELECT s_name, count(*) AS numwait
FROM annotated
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE supp_late = 1 AND n_supps > 1 AND n_late = 1
  AND n_name = 'NATION_1'
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""

# Derived part→supplier relation standing in for partsupp.  min() is
# exact on doubles (no accumulation); availqty accumulates in
# DECIMAL(12,2) (l_quantity is a small integer-valued double).
_PS_CTE = """
ps AS (
  SELECT l_partkey AS ps_partkey,
         l_suppkey AS ps_suppkey,
         min(l_extendedprice) AS ps_supplycost,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(12,2))
           AS ps_availqty
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
)
"""

Q2_SPARK = f"""
WITH {_PS_CTE}
SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal,
       s_name, n_name, p_partkey, p_type,
       CAST(ps_supplycost AS DOUBLE) AS supplycost
FROM ps
JOIN part     ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size <= 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
  AND ps_supplycost = (
        SELECT min(ps2.ps_supplycost)
        FROM ps ps2
        JOIN supplier s2 ON s2.s_suppkey   = ps2.ps_suppkey
        JOIN nation   n2 ON n2.n_nationkey = s2.s_nationkey
        JOIN region   r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
"""

# Round 15: the correlated min subquery re-evaluated the ps CTE (the
# whole lineitem groupBy) a second time under Spark's CTE inlining.
# The per-part minimum becomes min() OVER (PARTITION BY ps_partkey)
# on the SAME European ps relation the outer query scans — one ps
# evaluation, identical rows (the subquery's min is over all European
# suppliers of the part, before part-side filters, exactly like
# eups). DuckDB oracle keeps the textbook correlated spelling.
Q2_SPARK_OPT = f"""
WITH {_PS_CTE},
eups AS (
  SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name
  FROM ps
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
w AS (
  SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name,
         min(ps_supplycost) OVER (PARTITION BY ps_partkey) AS min_cost
  FROM eups
)
SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal,
       s_name, n_name, p_partkey, p_type,
       CAST(ps_supplycost AS DOUBLE) AS supplycost
FROM w
JOIN part ON p_partkey = ps_partkey
WHERE p_size <= 15 AND p_type = 'STANDARD'
  AND ps_supplycost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
"""

Q11_SPARK = f"""
WITH {_PS_CTE},
natps AS (
  SELECT ps_partkey,
         CAST(ps_supplycost AS DECIMAL(18,6)) * ps_availqty AS val
  FROM ps
  JOIN supplier ON s_suppkey   = ps_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
)
SELECT ps_partkey, CAST(sum(val) AS DOUBLE) AS part_value
FROM natps
GROUP BY ps_partkey
HAVING CAST(sum(val) AS DOUBLE) >
       (SELECT CAST(sum(val) AS DOUBLE) * 0.001 FROM natps)
ORDER BY part_value DESC, ps_partkey
"""

# Round 15 (optimization guide §2.3/§2.4): Q11_SPARK references natps
# twice (per-group HAVING + the total scalar subquery) and Spark
# inlines CTEs — the whole lineitem groupBy ran twice. This spelling
# aggregates per group ONCE and derives the total as the sum of the
# group sums (exact: decimal addition is associative and DECIMAL(38,8)
# holds the fixture magnitudes with ~19 digits of headroom), attached
# via the sanctioned 1-row cross join. The DuckDB oracle keeps the
# textbook Q11_SPARK spelling, so the hash gate pins the equivalence.
Q11_SPARK_OPT = f"""
WITH {_PS_CTE},
natps AS (
  SELECT ps_partkey,
         CAST(ps_supplycost AS DECIMAL(18,6)) * ps_availqty AS val
  FROM ps
  JOIN supplier ON s_suppkey   = ps_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
),
g AS (
  SELECT ps_partkey, sum(val) AS sval
  FROM natps GROUP BY ps_partkey
),
t AS (
  SELECT CAST(sum(sval) AS DOUBLE) * 0.001 AS thresh FROM g
)
SELECT ps_partkey, CAST(sval AS DOUBLE) AS part_value
FROM g CROSS JOIN t
WHERE CAST(sval AS DOUBLE) > thresh
ORDER BY part_value DESC, ps_partkey
"""

Q12_SPARK = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

Q16_SPARK = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT ps_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      FROM lineitem) ps
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#3'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND ps_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

Q20_SPARK = f"""
WITH {_PS_CTE}
SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_0', 'NATION_1', 'NATION_2',
                 'NATION_3', 'NATION_4')
  AND s_suppkey IN (
        SELECT ps_suppkey
        FROM ps
        WHERE ps_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND ps_availqty * 2 > (
                SELECT CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
                            AS DECIMAL(12,2))
                FROM lineitem
                WHERE l_partkey = ps_partkey
                  AND l_suppkey = ps_suppkey
                  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00')
  )
ORDER BY s_name
"""

_ALL = ("lineitem", "part", "supplier", "nation", "region")

QUERIES = {
    "q2_min_cost_supplier": _run(Q2_SPARK_OPT, _ALL),
    "q4_order_priority": _run(Q4_SPARK, ("orders", "lineitem")),
    "q6_forecast_revenue": _run(Q6_SPARK, ("lineitem",)),
    "q7_volume_shipping": _run(
        Q7_SPARK, ("lineitem", "supplier", "orders", "customer", "nation")
    ),
    "q8_market_share": _run(
        Q8_SPARK,
        ("lineitem", "orders", "customer", "nation", "region", "supplier",
         "part"),
    ),
    "q9_product_profit": _run(
        Q9_SPARK, ("lineitem", "supplier", "part", "orders", "nation")
    ),
    "q10_returned_items": _run(
        Q10_SPARK, ("customer", "orders", "lineitem", "nation")
    ),
    "q11_important_stock": _run(
        Q11_SPARK_OPT, ("lineitem", "supplier", "nation")
    ),
    "q12_priority_class": _run(Q12_SPARK, ("orders", "lineitem")),
    "q13_order_distribution": _run(Q13_SPARK, ("customer", "orders")),
    "q14_promo_effect": _run(Q14_SPARK, ("lineitem", "part")),
    "q15_top_supplier": _run(Q15_SPARK, ("lineitem", "supplier")),
    "q16_supplier_cnt": _run(Q16_SPARK, ("lineitem", "part", "supplier")),
    "q17_small_qty_revenue": _run(Q17_SPARK, ("lineitem", "part")),
    "q18_large_volume": _run(Q18_SPARK, ("customer", "orders", "lineitem")),
    "q19_disjunctive": _run(Q19_SPARK, ("lineitem", "part")),
    "q20_promotion_suppliers": _run(
        Q20_SPARK, ("lineitem", "part", "supplier", "nation")
    ),
    "q21_waiting_suppliers": _run(
        Q21_SPARK_OPT, ("lineitem", "orders", "supplier", "nation")
    ),
    "q22_inactive_high_balance": _run(Q22_SPARK, ("customer", "orders")),
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SPARK,
    "q4_order_priority": Q4_SPARK,
    "q6_forecast_revenue": Q6_SPARK,
    "q7_volume_shipping": Q7_DUCK,
    "q8_market_share": Q8_DUCK,
    "q9_product_profit": Q9_DUCK,
    "q10_returned_items": Q10_DUCK,
    "q11_important_stock": Q11_SPARK,
    "q12_priority_class": Q12_SPARK,
    "q13_order_distribution": Q13_SPARK,
    "q14_promo_effect": Q14_SPARK,
    "q15_top_supplier": Q15_SPARK,
    "q16_supplier_cnt": Q16_SPARK,
    "q17_small_qty_revenue": Q17_SPARK,
    "q18_large_volume": Q18_SPARK,
    "q19_disjunctive": Q19_SPARK,
    "q20_promotion_suppliers": Q20_SPARK,
    "q21_waiting_suppliers": Q21_SPARK,
    "q22_inactive_high_balance": Q22_SPARK,
}
