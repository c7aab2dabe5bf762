"""Set-operator, grouping-set, subquery, and scalar-function surface:
semi/anti joins, INTERSECT/EXCEPT, ROLLUP/CUBE/GROUPING SETS,
conditional pivot, correlated subqueries, UNION ALL, date/string
function parity, and the error-bounded distinct sketch (round 9 —
consolidation of the former relational2/3 waves, unchanged SQL).

Each query is dialect-parallel with its DuckDB oracle; integer-exact
arithmetic (decimal sums, explicit casts) keeps value hashes
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from .sqlrun import _run

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

# --------------------------------------------------- correlated / union

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

# ------------------------------------------------- distinct sketches

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
    "customers_without_orders": _run(ANTI_JOIN_SPARK, ("customer", "orders")),
    "active_customers_semi": _run(SEMI_JOIN_SPARK, ("customer", "orders")),
    "partkey_set_ops": _run(SET_OPS_SPARK, ("lineitem",)),
    "brand_type_rollup": _run(ROLLUP_SPARK, ("part",)),
    "customer_cube": _run(CUBE_SPARK, ("customer",)),
    "lineitem_grouping_sets": _run(GROUPING_SETS_SPARK, ("lineitem",)),
    "priority_pivot": _run(PIVOT_SPARK, ("orders",)),
    "parts_above_brand_avg": _run(CORRELATED_SPARK, ("part",)),
    "names_union_all": _run(UNION_SPARK, ("customer", "supplier")),
    "orders_date_parts": _run(DATE_PARTS_SPARK, ("orders",)),
    "part_string_funcs": _run(STRINGS_SPARK, ("part",)),
    "distinct_sketches": _q_sketches,
}

ORACLES = {
    "customers_without_orders": ANTI_JOIN_SPARK,
    "active_customers_semi": SEMI_JOIN_SPARK,
    "partkey_set_ops": SET_OPS_DUCK,
    "brand_type_rollup": ROLLUP_DUCK,
    "customer_cube": CUBE_SPARK,
    "lineitem_grouping_sets": GROUPING_SETS_SPARK,
    "priority_pivot": PIVOT_DUCK,
    "parts_above_brand_avg": CORRELATED_SPARK,
    "names_union_all": UNION_SPARK,
    "orders_date_parts": DATE_PARTS_DUCK,
    "part_string_funcs": STRINGS_DUCK,
    "distinct_sketches": SKETCHES_DUCK,
}
