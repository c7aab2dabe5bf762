"""Window-function and order-statistics surface: quantiles, medians,
modes, gaps, trailing frames, ntiles, within-group percentile ranks,
RFM segmentation, and the rank-bounded percentile sketch (round 9 —
consolidation of the former relational2/3/5/7 waves, unchanged SQL).

Determinism notes (carried with each query): exact interpolated
percentiles hash-match after round(6) because both engines
interpolate ``lo + (hi - lo) * frac`` in IEEE double at position
(n-1)*p; modes and argmax/argmin are CONSTRUCTED explicitly
(row_number / encoded bigint) instead of engine mode()/max_by() whose
tie rules differ; percentile ranks are integer ppm with DIV//
truncation. Every window here partitions on a real key (customer,
nation, returnflag) — the global-window anti-pattern is banned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from .sqlrun import _run

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

MEDIAN_SPARK = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(round(percentile(o_totalprice, 0.5), 6) AS DOUBLE)
           AS median_price,
       CAST(round(percentile(o_totalprice, 0.9), 6) AS DOUBLE)
           AS p90_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

MEDIAN_DUCK = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(round(quantile_cont(o_totalprice, 0.5), 6) AS DOUBLE)
           AS median_price,
       CAST(round(quantile_cont(o_totalprice, 0.9), 6) AS DOUBLE)
           AS p90_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# per-group mode constructed explicitly (count -> row_number -> rn=1);
# ties resolve to the smallest value. Quantities floored before
# casting: Spark CAST(double AS INT) truncates while DuckDB rounds.

MODE_SPARK = """
WITH c AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity) AS INT) AS qty,
         count(*) AS n
  FROM lineitem
  GROUP BY l_returnflag, CAST(floor(l_quantity) AS INT)
)
SELECT l_returnflag, qty AS mode_qty, n AS n_occurrences
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY l_returnflag ORDER BY n DESC, qty ASC
  ) AS rn
  FROM c
)
WHERE rn = 1
ORDER BY l_returnflag
"""

MODE_DUCK = """
WITH c AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity) AS INT) AS qty,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem
  GROUP BY l_returnflag, CAST(floor(l_quantity) AS INT)
)
SELECT l_returnflag, qty AS mode_qty, n AS n_occurrences
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY l_returnflag ORDER BY n DESC, qty ASC
  ) AS rn
  FROM c
)
WHERE rn = 1
ORDER BY l_returnflag
"""

# ----------------------------------------------------------- order gaps

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

# Spark side of customer_value_ntiles: the DuckDB oracle keeps the
# window form above (single-node, scale-exempt); Spark ranks via the
# two-pass textops.attach_rank — an unpartitioned ntile/percent_rank
# window serializes every customer through one task at scale. With a
# total order (the window sorts on (total_spent, c_custkey)) the
# window functions reduce to closed forms of the global row number r
# and count n: ntile(k) fills the first n%k buckets with n/k+1 rows
# and the rest with n/k; percent_rank = (r-1)/(n-1) — with the n=1
# degenerate case pinned to 0.0, matching SQL percent_rank (ADVICE
# r14: the raw closed form yields NaN there); cume_dist = r/n.
_NTILE_BASE_SPARK = """
SELECT c_custkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_spent
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
"""

_NTILE_FINAL_SPARK = """
WITH p AS (
  SELECT count(*) AS n, count(*) DIV 4 AS q, count(*) % 4 AS rem
  FROM _ntile_ranked
)
SELECT c_custkey, total_spent,
       CAST(CASE WHEN r <= rem * (q + 1) THEN (r + q) DIV (q + 1)
                 ELSE rem + (r - rem * (q + 1) + q - 1) DIV q
            END AS INT) AS quartile,
       CASE WHEN n = 1 THEN CAST(0.0 AS DOUBLE)
            ELSE round(CAST(r - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE), 6)
       END AS pct_rank,
       round(CAST(r AS DOUBLE) / CAST(n AS DOUBLE), 6) AS cume
FROM _ntile_ranked CROSS JOIN p
"""


def _q_value_ntiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textops import attach_rank

    for t in ("orders", "customer"):
        catalog.load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    base = spark.sql(_NTILE_BASE_SPARK)
    ranked = attach_rank(
        base.withColumn("_neg", -F.col("total_spent")),
        ["_neg", "c_custkey"],
        out_col="r",
    ).drop("_neg")
    ranked.createOrReplaceTempView("_ntile_ranked")
    return spark.sql(_NTILE_FINAL_SPARK)

# First/last order per customer — the argmax/argmin shape. max_by/
# arg_max tie rules are engine-specific, so the argmax is ENCODED:
# epoch-day * 10^11 + orderkey is a single bigint whose min/max is
# the lexicographic (date, key) extreme; decode with modulo. One
# map-side-combinable agg, no window, no join — the cheapest argmax
# formulation at any scale.

FIRST_LAST_SPARK = """
WITH enc AS (
  SELECT o_custkey,
         datediff(o_orderdate, TIMESTAMP '1970-01-01 00:00:00')
             * 100000000000 + o_orderkey AS e
  FROM orders
)
SELECT o_custkey,
       count(*) AS n_orders,
       CAST(min(e) % 100000000000 AS BIGINT) AS first_orderkey,
       CAST(max(e) % 100000000000 AS BIGINT) AS last_orderkey
FROM enc
GROUP BY o_custkey
ORDER BY o_custkey
"""

FIRST_LAST_DUCK = """
WITH enc AS (
  SELECT o_custkey,
         CAST(date_diff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate)
             AS BIGINT) * 100000000000 + o_orderkey AS e
  FROM orders
)
SELECT o_custkey,
       count(*) AS n_orders,
       CAST(min(e) % 100000000000 AS BIGINT) AS first_orderkey,
       CAST(max(e) % 100000000000 AS BIGINT) AS last_orderkey
FROM enc
GROUP BY o_custkey
ORDER BY o_custkey
"""

# ------------------------------- within-nation spend percentile rank
# percent-rank of customer spend WITHIN nation, in integer ppm
# ((rn−1)·10⁶ DIV (n−1)) — no float division, and the window
# partitions on nation (a keyed window; a global percent_rank would
# serialize the customer table through one task at scale).


def _pctile_sql(div: str) -> str:
    return f"""
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DECIMAL(25,2))
           AS sp
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT c.c_custkey, c.c_nationkey,
         coalesce(s.sp, CAST(0 AS DECIMAL(25,2))) AS sp
  FROM customer c LEFT JOIN spend s ON s.o_custkey = c.c_custkey
),
r AS (
  SELECT c_custkey, c_nationkey, sp,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY sp DESC, c_custkey) AS rn,
         count(*) OVER (PARTITION BY c_nationkey) AS n
  FROM j
)
SELECT c_custkey,
       CAST(c_nationkey AS INT) AS nation,
       CAST(sp AS DOUBLE) AS spend,
       CAST(CASE WHEN n > 1
                 THEN (rn - 1) * 1000000 {div} (n - 1)
                 ELSE 0 END AS BIGINT) AS pct_ppm
FROM r
ORDER BY c_custkey
"""


SPEND_PCTILE_SPARK = _pctile_sql("DIV")
SPEND_PCTILE_DUCK = _pctile_sql("//")


def _q_spend_pctile(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "customer"):
        catalog.load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(SPEND_PCTILE_SPARK)


# --------------------------------------------- RFM segmentation
# Classic recency/frequency/monetary customer segmentation with
# tertile codes computed PER NATION via keyed windows (rank and
# count partitioned on nation) — the scale-safe form: a global
# ntile(3) serializes the whole customer dimension through one task.
# Tertile assignment is pure integer arithmetic:
# code = least(3, (rn-1)*3 DIV n + 1); recency in whole epoch-days,
# monetary in DECIMAL. Output is the segment rollup (nation, rfm,
# counts, spend) — what a campaign/curation consumer actually reads.


def _rfm_sql(div: str) -> str:
    code = f"least(3, (({{rn}} - 1) * 3) {div} {{n}} + 1)"
    r_code = code.format(rn="r_rn", n="n_cust")
    f_code = code.format(rn="f_rn", n="n_cust")
    m_code = code.format(rn="m_rn", n="n_cust")
    return f"""
WITH per_cust AS (
  SELECT o_custkey,
         max(epoch_day) AS last_day,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(25,2)))
              AS DECIMAL(25,2)) AS spend
  FROM (
    SELECT o_custkey, o_totalprice,
           {{epoch_day}} AS epoch_day
    FROM orders
  ) GROUP BY o_custkey
),
j AS (
  SELECT c.c_custkey, c.c_nationkey,
         p.last_day, p.n_orders, p.spend
  FROM customer c JOIN per_cust p ON p.o_custkey = c.c_custkey
),
ranked AS (
  SELECT c_custkey, c_nationkey,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY last_day DESC, c_custkey) AS r_rn,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY n_orders DESC, c_custkey) AS f_rn,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY spend DESC, c_custkey) AS m_rn,
         count(*) OVER (PARTITION BY c_nationkey) AS n_cust,
         spend
  FROM j
)
SELECT CAST(c_nationkey AS INT) AS nation,
       CAST({r_code} * 100 + {f_code} * 10 + {m_code} AS INT) AS rfm,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(spend) AS DOUBLE) AS total_spend
FROM ranked
GROUP BY 1, 2
ORDER BY nation, rfm
"""


RFM_SPARK = _rfm_sql("DIV").format(
    epoch_day="datediff(o_orderdate, DATE '1970-01-01')"
)
RFM_DUCK = _rfm_sql("//").format(
    epoch_day="datediff('day', DATE '1970-01-01', o_orderdate)"
)


def _q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "customer"):
        catalog.load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(RFM_SPARK)


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

QUERIES = {
    "lineitem_quantiles": _run(QUANTILES_SPARK, ("lineitem",)),
    "orders_median_by_priority": _run(MEDIAN_SPARK, ("orders",)),
    "lineitem_qty_mode": _run(MODE_SPARK, ("lineitem",)),
    "customer_order_gaps": _run(ORDER_GAPS_SPARK, ("orders",)),
    "orders_trailing_30d": _run(TRAILING_SPARK, ("orders",)),
    "customer_value_ntiles": _q_value_ntiles,
    "customer_first_last_order": _run(FIRST_LAST_SPARK, ("orders",)),
    "customer_nation_spend_percentile": _q_spend_pctile,
    "customer_rfm_segments": _q_rfm,
    "value_percentiles_sketch": _q_percentile_sketch,
}
ORACLES = {
    "lineitem_quantiles": QUANTILES_DUCK,
    "orders_median_by_priority": MEDIAN_DUCK,
    "lineitem_qty_mode": MODE_DUCK,
    "customer_order_gaps": ORDER_GAPS_DUCK,
    "orders_trailing_30d": TRAILING_DUCK,
    "customer_value_ntiles": NTILE_SPARK,
    "customer_first_last_order": FIRST_LAST_DUCK,
    "customer_nation_spend_percentile": SPEND_PCTILE_DUCK,
    "customer_rfm_segments": RFM_DUCK,
    "value_percentiles_sketch": PERCENTILE_SKETCH_DUCK,
}
