"""Event/warehouse analytics wave: funnel, cohort retention, SCD2
dimension build, and Deequ-style data-quality checks.

None of these exist in the reference (it has no event or timestamp
data at all — SURVEY.md §2.6 records "no value joins"); they are the
standard warehouse shapes a team replacing the reference with a
Spark-scale pipeline would ask for next, and each is expressible as
pure declarative SQL that runs verbatim (or near-verbatim) on both
Spark and the DuckDB oracle:

- **funnel** — staged conversion: for each user the earliest `view`,
  the earliest `click` strictly after it, the earliest `purchase`
  strictly after that. Three grouped min-aggregates chained by
  equi-joins: each stage is ONE shuffle on user_id, no window over
  the whole event stream, no inequality-join explosion (the
  inequality lands on the already-aggregated 1-row-per-user sides).
- **cohort retention** — users grouped by first-activity week, counted
  per week offset. Two aggregations + one equi-join on user_id;
  week arithmetic is integer day-numbers (datediff from epoch) so
  both engines agree exactly.
- **SCD2** — slowly-changing dimension type 2 build over order
  priority: collapse each customer's order history to change-points
  (lag() != current), then close each regime with the next change's
  date (lead()). Two windows over the same (custkey, date, key)
  ordering — one shuffle, linear in |orders|; the classic
  "row_number-diff" SCD build with no self-join.
- **quality report** — completeness / uniqueness / referential /
  domain constraint counters in one pass over orders plus one
  broadcast-shaped anti-join for FK orphans, emitted as (metric,
  value) rows — the Deequ/`dbt test` shape.
- **profile** — per-column non-null, distinct, min/max profile as a
  UNION ALL of single-column aggregates. Only exactly-renderable
  column types (ints / strings) are profiled so min/max stringify
  identically on both engines.

At 100 TB: every shape here is shuffle-on-key aggregation or window
— AQE handles skew; nothing collects to the driver; no per-row
Python. The funnel deliberately aggregates BEFORE joining (the
anti-pattern is joining raw event streams and exploding); SCD2's two
windows share one partitioning (single Exchange in the plan,
asserted in tests/test_analytics.py).
"""

from __future__ import annotations

from .sqlrun import _run

# --------------------------------------------------------- funnel

FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT stage, n_users FROM (
  SELECT 1 AS stage_no, 'view' AS stage, count(*) AS n_users FROM v
  UNION ALL
  SELECT 2, 'click_after_view', count(*) FROM c
  UNION ALL
  SELECT 3, 'purchase_after_click', count(*) FROM p
) ORDER BY stage_no
"""

# ------------------------------------------------ cohort retention

# Integer week arithmetic: day number = days since 1970-01-01, week
# bucket = day DIV 7. Spark datediff(a, b) == DuckDB datediff('day',
# b, a); integer division is DIV vs //.
COHORT_SPARK = """
WITH firsts AS (
  SELECT user_id,
         CAST(datediff(min(ts), DATE '1970-01-01') DIV 7 AS INT) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id,
         CAST(datediff(ts, DATE '1970-01-01') DIV 7 AS INT) AS act_week
  FROM events
)
SELECT f.cohort_week,
       CAST(a.act_week - f.cohort_week AS INT) AS week_offset,
       count(*) AS n_users
FROM firsts f JOIN activity a ON f.user_id = a.user_id
GROUP BY f.cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""

COHORT_DUCK = """
WITH firsts AS (
  SELECT user_id,
         CAST(datediff('day', DATE '1970-01-01', min(ts)) // 7 AS INT) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', DATE '1970-01-01', ts) // 7 AS INT) AS act_week
  FROM events
)
SELECT f.cohort_week,
       CAST(a.act_week - f.cohort_week AS INT) AS week_offset,
       count(*) AS n_users
FROM firsts f JOIN activity a ON f.user_id = a.user_id
GROUP BY f.cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""

# ------------------------------------------------------------ SCD2

# Change-point SCD: keep orders whose priority differs from the
# customer's previous order (lag), then the regime closes at the next
# kept row's date (lead over the filtered set). Ties on o_orderdate
# are broken by o_orderkey so both engines see one deterministic
# history. Output dates rendered as strings (oracle hash parity).
_SCD2_BODY = """
WITH ordered AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         lag(o_orderpriority) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS prev_prio
  FROM orders
),
changes AS (
  SELECT o_custkey, o_orderpriority, o_orderdate,
         row_number() OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS version,
         lead(o_orderdate) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS next_change
  FROM ordered
  WHERE prev_prio IS NULL OR prev_prio <> o_orderpriority
)
SELECT o_custkey, o_orderpriority AS priority,
       CAST(version AS INT) AS version,
       {fmt_from} AS effective_from,
       CASE WHEN next_change IS NULL THEN '9999-12-31'
            ELSE {fmt_to} END AS effective_to
FROM changes
ORDER BY o_custkey, version
"""

SCD2_SPARK = _SCD2_BODY.format(
    fmt_from="date_format(o_orderdate, 'yyyy-MM-dd')",
    fmt_to="date_format(next_change, 'yyyy-MM-dd')",
)
SCD2_DUCK = _SCD2_BODY.format(
    fmt_from="strftime(o_orderdate, '%Y-%m-%d')",
    fmt_to="strftime(next_change, '%Y-%m-%d')",
)

# -------------------------------------------------- quality report

QUALITY_SQL = """
WITH base AS (
  SELECT count(*) AS n_rows,
         count(o_custkey) AS custkey_non_null,
         count(o_totalprice) AS totalprice_non_null,
         count(*) - count(DISTINCT o_orderkey) AS pk_dups,
         sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
             AS nonpositive_price,
         sum(CASE WHEN o_orderpriority NOT IN
                  ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                  THEN 1 ELSE 0 END) AS bad_priority
  FROM orders
),
orphans AS (
  SELECT count(*) AS fk_orphans
  FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT metric, value FROM (
  SELECT 1 AS ord, 'n_rows' AS metric, CAST(n_rows AS BIGINT) AS value FROM base
  UNION ALL SELECT 2, 'custkey_nulls', CAST(n_rows - custkey_non_null AS BIGINT) FROM base
  UNION ALL SELECT 3, 'totalprice_nulls', CAST(n_rows - totalprice_non_null AS BIGINT) FROM base
  UNION ALL SELECT 4, 'pk_duplicates', CAST(pk_dups AS BIGINT) FROM base
  UNION ALL SELECT 5, 'nonpositive_price', CAST(nonpositive_price AS BIGINT) FROM base
  UNION ALL SELECT 6, 'bad_priority_domain', CAST(bad_priority AS BIGINT) FROM base
  UNION ALL SELECT 7, 'fk_orphans', CAST(fk_orphans AS BIGINT) FROM orphans
) ORDER BY ord
"""

# ---------------------------------------------------------- profile

# Only exactly-stringifiable types (BIGINT / INT / VARCHAR): double
# min/max would need formatting rules that differ across engines.
_PROFILE_COL = """
SELECT {ord} AS ord, '{col}' AS column_name,
       count({col}) AS non_null,
       CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
       CAST(min({col}) AS STRING) AS min_value,
       CAST(max({col}) AS STRING) AS max_value
FROM lineitem
"""

_PROFILE_COLS = ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_returnflag", "l_linestatus")

PROFILE_SQL = (
    "SELECT column_name, non_null, n_distinct, min_value, max_value FROM ("
    + " UNION ALL ".join(
        _PROFILE_COL.format(ord=i, col=c) for i, c in enumerate(_PROFILE_COLS)
    )
    + ") ORDER BY ord"
)

PROFILE_DUCK = PROFILE_SQL.replace("AS STRING", "AS VARCHAR")


# --------------------------------------- SCD2 point-in-time snapshot
# Time travel over the SCD2 dimension: reconstruct every customer's
# priority regime as of a fixed date — the "what did the dim say when
# this model trained" query. effective_from/to are ISO strings, so the
# as-of predicate is a lexicographic range over the already-built
# dimension: at scale this reads the dim table (clusters well on
# custkey) and never re-touches the fact.

SNAPSHOT_DATE = "1997-06-01"


def _snapshot_sql(scd2_body: str) -> str:
    dim = scd2_body.replace("ORDER BY o_custkey, version", "")
    return f"""
WITH dim AS ({dim})
SELECT o_custkey, priority, version
FROM dim
WHERE effective_from <= '{SNAPSHOT_DATE}' AND effective_to > '{SNAPSHOT_DATE}'
ORDER BY o_custkey
"""


SNAPSHOT_SPARK = _snapshot_sql(SCD2_SPARK)
SNAPSHOT_DUCK = _snapshot_sql(SCD2_DUCK)


QUERIES = {
    "events_funnel": _run(FUNNEL_SQL, ("events",)),
    "events_cohort_retention": _run(COHORT_SPARK, ("events",)),
    "customer_scd2_dim": _run(SCD2_SPARK, ("orders",)),
    "orders_quality_report": _run(QUALITY_SQL, ("orders", "customer")),
    "lineitem_profile": _run(PROFILE_SQL, ("lineitem",)),
    "customer_asof_snapshot": _run(SNAPSHOT_SPARK, ("orders",)),
}

ORACLES = {
    "events_funnel": FUNNEL_SQL,
    "events_cohort_retention": COHORT_DUCK,
    "customer_scd2_dim": SCD2_DUCK,
    "orders_quality_report": QUALITY_SQL,
    "lineitem_profile": PROFILE_DUCK,
    "customer_asof_snapshot": SNAPSHOT_DUCK,
}
