"""Event-stream batch analytics: sessionization, path transitions,
hierarchical rollup reuse, anomaly flags, sliding windows, percentile
bands, and the long→wide pivot (round 9 — consolidation of the
events_* queries from the former relational2/3/5/7 waves, unchanged
SQL).

Determinism notes carried with each query; all time arithmetic is in
integer microseconds (unix_micros/epoch_us) or engine-shared
date_trunc, so value hashes match DuckDB exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog
from .sqlrun import _run

SESSION_GAP_US = 1_800_000_000  # 30 min in microseconds

# -------------------------------------------------------- sessionization
# Event-time sessions per user with a 30-min inactivity gap — the
# batch form of a streaming session window.

SESSIONIZE_SPARK = f"""
WITH ev AS (
  SELECT user_id, unix_micros(ts) AS ts_us FROM events
),
flagged AS (
  SELECT user_id, ts_us,
         CASE WHEN ts_us - lag(ts_us) OVER w > {SESSION_GAP_US}
              OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
),
sessions AS (
  SELECT user_id, ts_us,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id,
         CAST(max(ts_us) - min(ts_us) AS BIGINT) AS session_len_us,
         count(*) AS n_events
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id,
       count(*) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       max(session_len_us) AS max_session_us
FROM per_session
GROUP BY user_id
"""

SESSIONIZE_DUCK = SESSIONIZE_SPARK.replace("unix_micros(ts)", "epoch_us(ts)")


# ------------------------------------------------ path transitions
# Product-analytics path mining, step one: the event-type transition
# matrix (what users do NEXT after each action — the edge weights a
# sankey/flow view renders). One user-keyed window (scale-safe: the
# partition key is user_id, never global) + a small-key count;
# deterministic total order via (ts_us, event_id) so simultaneous
# events cannot flip transitions between engines. Top 20 with a full
# tie-break.

PATH_TRANSITIONS_SPARK = """
WITH ev AS (
  SELECT user_id, event_type, unix_micros(ts) AS ts_us, event_id
  FROM events
),
seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS prev_type
  FROM ev
)
SELECT prev_type,
       event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n_transitions
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
ORDER BY n_transitions DESC, prev_type, next_type
LIMIT 20
"""

PATH_TRANSITIONS_DUCK = PATH_TRANSITIONS_SPARK.replace(
    "unix_micros(ts)", "epoch_us(ts)"
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


# ----------------------------------------------------- anomaly flags
# Hourly count z-score flags, INTEGER-EXACT: |z| > 3 tested as
# (n*cnt - s)^2 > 9*(n*ss - s^2) over bigint counts — no sqrt, no
# float accumulation, hash-stable by construction. Two aggs (hourly
# counts, per-type moments) + one broadcast-sized join back.

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

# Percentile bands per event type: exact interpolated quantiles
# (both engines interpolate lo + (hi-lo)*frac in IEEE double at
# position (n-1)*p, hash-stable after round(6)).

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

# --------------------------------------------------- long→wide pivot
# Day × event-type counts as columns, written as explicit conditional
# aggregates rather than the PIVOT keyword so both engines share one
# semantic; Catalyst compiles it to a single map-side-combined hash
# aggregation either way — one shuffle on the day key.

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


QUERIES = {
    "events_sessionize": _run(SESSIONIZE_SPARK, ("events",)),
    "events_path_transitions": _run(PATH_TRANSITIONS_SPARK, ("events",)),
    "events_daily_from_hourly": _q_daily_from_hourly,
    "events_anomaly_hours": _run(ANOMALY_SPARK, ("events",)),
    "events_sliding_active_users": _run(SLIDING_SPARK, ("events",)),
    "events_value_percentiles": _run(EVENT_PCT_SPARK, ("events",)),
    "events_type_pivot": _q_events_pivot,
}
ORACLES = {
    "events_sessionize": SESSIONIZE_DUCK,
    "events_path_transitions": PATH_TRANSITIONS_DUCK,
    "events_daily_from_hourly": DAILY_DIRECT_DUCK,
    "events_anomaly_hours": ANOMALY_DUCK,
    "events_sliding_active_users": SLIDING_DUCK,
    "events_value_percentiles": EVENT_PCT_DUCK,
    "events_type_pivot": EVENTS_PIVOT_DUCK,
}
