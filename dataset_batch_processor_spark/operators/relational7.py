"""Round-6 relational surface extensions: wide pivot and within-group
percentile ranks.

- **events_type_pivot**: the classic long→wide pivot (day × event
  type counts as columns). Written as explicit conditional aggregates
  rather than the PIVOT keyword so both engines share one semantic;
  Catalyst compiles it to a single map-side-combined hash aggregation
  either way — one shuffle on the day key.
- **customer_nation_spend_percentile**: percent-rank of customer
  spend WITHIN nation, in integer ppm ((rn−1)·10⁶ DIV (n−1)) — no
  float division, and the window partitions on nation (a keyed
  window; a global percent_rank would serialize the customer table
  through one task at scale, the single-partition-window
  anti-pattern the engine bans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog

_TYPES = ("click", "error", "purchase", "signup", "view")

_PIVOT_COLS = ",\n       ".join(
    f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS n_{t}"
    for t in _TYPES
)


def _pivot_sql(day_expr: str) -> str:
    return f"""
SELECT {day_expr} AS day,
       {_PIVOT_COLS},
       CAST(count(*) AS BIGINT) AS n_total
FROM events
GROUP BY 1
ORDER BY day
"""


EVENTS_PIVOT_SPARK = _pivot_sql("unix_micros(ts) DIV 86400000000")
EVENTS_PIVOT_DUCK = _pivot_sql("epoch_us(ts) // 86400000000")


def _q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.load_events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(EVENTS_PIVOT_SPARK)


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


QUERIES = {
    "events_type_pivot": _q_events_pivot,
    "customer_nation_spend_percentile": _q_spend_pctile,
}
ORACLES = {
    "events_type_pivot": EVENTS_PIVOT_DUCK,
    "customer_nation_spend_percentile": SPEND_PCTILE_DUCK,
}


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


QUERIES["customer_rfm_segments"] = _q_rfm
ORACLES["customer_rfm_segments"] = RFM_DUCK
