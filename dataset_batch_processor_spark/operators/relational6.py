"""Sixth relational wave: the five TPC-H shapes previously out of
reach — q2 / q11 / q12 / q16 / q20 — adapted to the reduced fixture.

The driver's tables have no ``partsupp`` and no ``l_shipmode``
(SURVEY.md §6; relational4.py header documents the earlier judgment
call).  The *plan shapes* of those queries are still expressible: a
part→supplier relation derived once from ``lineitem`` (``GROUP BY
l_partkey, l_suppkey``) plays the role of partsupp, and
``o_orderpriority`` classes stand in for shipmode.  What matters for
engine parity is the query *structure*, which is kept canonical:

- q2  min-cost supplier: multi-join + correlated scalar-MIN subquery
  over the same derived relation (the classic decorrelation test).
- q11 important stock: per-group value share vs a scalar subquery over
  the whole relation (HAVING against a global total).
- q12 priority class: join + two-way conditional counts (CASE sums)
  with a range predicate on the fact table.
- q16 supplier count: COUNT(DISTINCT) per attribute triple with a
  NOT IN anti-subquery on the dimension.
- q20 part promotion: nested IN subqueries with a correlated
  half-of-sum threshold (the "2*availqty > shipped qty" form keeps
  the comparison in exact DECIMAL — no 0.5 literal).

Engine-portable determinism (README "Design rules"): the derived
``ps_supplycost`` is ``min(l_extendedprice)`` — a pure column min,
no float accumulation; ``ps_availqty`` accumulates in DECIMAL(12,2);
the q11 value product is DECIMAL(18,6) x DECIMAL(12,2) (fits
precision 31, exact in both engines) and the share threshold is
compared in IEEE doubles derived from exact decimal sums, identical
bit patterns on both sides.  All five queries run the same SQL text
on Spark and DuckDB.

At 100 TB: the ps CTE is one map-side-combined shuffle on
(l_partkey, l_suppkey); every dimension join (part, supplier, nation,
region) broadcasts; the correlated scalars decorrelate to aggregate +
re-join on the same keys (no per-row rescans); q16's NOT IN is a
broadcast null-aware anti join against a 100-row dimension.
"""

from __future__ import annotations

from .relational2 import _run

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
    "q2_min_cost_supplier": _run(Q2_SPARK, _ALL),
    "q11_important_stock": _run(
        Q11_SPARK, ("lineitem", "supplier", "nation")
    ),
    "q12_priority_class": _run(Q12_SPARK, ("orders", "lineitem")),
    "q16_supplier_cnt": _run(Q16_SPARK, ("lineitem", "part", "supplier")),
    "q20_promotion_suppliers": _run(
        Q20_SPARK, ("lineitem", "part", "supplier", "nation")
    ),
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SPARK,
    "q11_important_stock": Q11_SPARK,
    "q12_priority_class": Q12_SPARK,
    "q16_supplier_cnt": Q16_SPARK,
    "q20_promotion_suppliers": Q20_SPARK,
}
