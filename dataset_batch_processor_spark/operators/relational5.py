"""Fifth relational wave: order statistics and robust-stats shapes.

Reference parity: the reference's stats panel reports medians and
most-common values over batch outputs (run summary counters,
/root/reference/modules/other_tasks.py aggregate prints); these are
the scalable formulations of those summaries, plus the anomaly-flag
rollup a monitoring pipeline runs over event streams.

- orders_median_by_priority: EXACT interpolated median + p90 per
  group. Both engines interpolate `lo + (hi - lo) * frac` in IEEE
  double at position (n-1)*p, so values hash-match after round(6).
  Scale: percentile is a sort-based agg per group — one shuffle on
  the group key; groups are few, values per group fit an executor
  (no global sort).
- lineitem_qty_mode: per-group mode CONSTRUCTED explicitly
  (count -> row_number -> rn=1) instead of an engine mode() whose tie
  rules differ; ties resolve to the smallest value. Two shuffles
  (count, then 5-row window), map-side combine does the heavy lift.
- events_anomaly_hours: hourly count z-score flags, INTEGER-EXACT:
  |z| > 3 tested as (n*cnt - s)^2 > 9*(n*ss - s^2) over bigint
  counts — no sqrt, no float accumulation, hash-stable by
  construction. Two aggs (hourly counts, per-type moments) + one
  broadcast-sized join back.

Quantities are floored before casting: Spark CAST(double AS INT)
truncates while DuckDB rounds, so an explicit floor() keeps both
engines on the same integer.
"""

from __future__ import annotations

from .relational2 import _run

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

_ANOMALY_BODY = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events
  GROUP BY event_type, date_trunc('hour', ts)
),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cnt) AS BIGINT) AS tot,
         CAST(sum(cnt * cnt) AS BIGINT) AS totsq
  FROM h
  GROUP BY event_type
)
SELECT h.event_type,
       {hour_fmt} AS hour,
       cnt AS n_events,
       ((n * cnt - tot) * (n * cnt - tot) > 9 * (n * totsq - tot * tot))
           AS is_anomaly
FROM h JOIN s ON h.event_type = s.event_type
ORDER BY h.event_type, hour
"""

ANOMALY_SPARK = _ANOMALY_BODY.format(
    hour_fmt="date_format(hr, 'yyyy-MM-dd HH:mm:ss')"
)
ANOMALY_DUCK = _ANOMALY_BODY.format(
    hour_fmt="strftime(hr, '%Y-%m-%d %H:%M:%S')"
)

# Sliding-window activity: 3-hour windows advancing hourly — the
# batch form of the watermarked sliding aggregation Structured
# Streaming runs (each event lands in exactly 3 hour-aligned
# windows). Spark: native window() expression (one explode + one agg,
# both map-side expandable). Oracle: explicit 3-way window-start
# expansion, which is precisely window()'s defined semantics for
# windowDuration=3h, slideDuration=1h. countDistinct shuffles
# (window_start, user) pre-agg first — the two-level exact-distinct
# plan that survives skew at scale.

SLIDING_SPARK = """
SELECT date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS window_start,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events
GROUP BY window(ts, '3 hours', '1 hour')
ORDER BY window_start
"""

SLIDING_DUCK = """
SELECT strftime(date_trunc('hour', ts) - to_hours(k), '%Y-%m-%d %H:%M:%S')
           AS window_start,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events, (SELECT unnest([0, 1, 2]) AS k) t
GROUP BY 1
ORDER BY window_start
"""

# Percentile bands per event type: same exact-interpolation contract
# as orders_median_by_priority, three quantiles in one sort-based agg.

EVENT_PCT_SPARK = """
SELECT event_type,
       count(*) AS n_events,
       CAST(round(percentile(value, 0.5), 6) AS DOUBLE) AS p50,
       CAST(round(percentile(value, 0.95), 6) AS DOUBLE) AS p95,
       CAST(round(percentile(value, 0.99), 6) AS DOUBLE) AS p99
FROM events
GROUP BY event_type
ORDER BY event_type
"""

EVENT_PCT_DUCK = """
SELECT event_type,
       count(*) AS n_events,
       CAST(round(quantile_cont(value, 0.5), 6) AS DOUBLE) AS p50,
       CAST(round(quantile_cont(value, 0.95), 6) AS DOUBLE) AS p95,
       CAST(round(quantile_cont(value, 0.99), 6) AS DOUBLE) AS p99
FROM events
GROUP BY event_type
ORDER BY event_type
"""

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

QUERIES = {
    "orders_median_by_priority": _run(MEDIAN_SPARK, ("orders",)),
    "lineitem_qty_mode": _run(MODE_SPARK, ("lineitem",)),
    "events_anomaly_hours": _run(ANOMALY_SPARK, ("events",)),
    "events_sliding_active_users": _run(SLIDING_SPARK, ("events",)),
    "events_value_percentiles": _run(EVENT_PCT_SPARK, ("events",)),
    "customer_first_last_order": _run(FIRST_LAST_SPARK, ("orders",)),
}
ORACLES = {
    "orders_median_by_priority": MEDIAN_DUCK,
    "lineitem_qty_mode": MODE_DUCK,
    "events_anomaly_hours": ANOMALY_DUCK,
    "events_sliding_active_users": SLIDING_DUCK,
    "events_value_percentiles": EVENT_PCT_DUCK,
    "customer_first_last_order": FIRST_LAST_DUCK,
}
