"""Temporal joins Spark lacks as built-ins: as-of and range joins.

Neither exists in the reference (no value joins at all, SURVEY.md
§2.6) nor as a native Spark operator; both are core to event/market
data pipelines, so the engine provides them as compositions of
built-in operators (the preferred strategy per SURVEY.md §4.2 —
no custom physical operator needed):

- **as-of join** — for each left row, the most recent right row at or
  before its timestamp, per key. Implemented with the scalable
  union + window construction: tag both sides, union, one window
  partitioned by key ordered by (time, side), carry the last
  non-null right attribute forward. Cost: ONE shuffle on the key
  (the window partition), regardless of how many right rows precede
  each left row — strictly better than the naive inequality join +
  argmax (which explodes to |L|×|R| per key before aggregating).
- **range join** — left rows matched to right rows in a bounded time
  interval. Implemented as an equi-join on the key with the range
  predicate as join condition: the shuffle is on the equality key,
  the range filter applies during the join, and AQE handles key skew.

Tie semantics (as-of): a right row exactly at the left timestamp
matches; among right ties on the timestamp the largest right id wins
(deterministic, oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import catalog


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row: the latest right row with
    right_ts <= left_ts, per ``on`` key. Returns left columns +
    requested right columns (null when no right row precedes).

    One shuffle (window partition on the key); linear in |L| + |R|.
    """
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_side"),
        "*",
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    # order: time asc, right rows BEFORE left rows at equal time
    # (so an exactly-simultaneous right row matches), right ties by
    # the raw first right_col (any orderable type — a cast-to-long
    # would NULL non-numeric ids and break tie determinism); `last`
    # then picks the largest id among equal-timestamp right rows.
    tie = F.col(f"_r_{right_cols[0]}")
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side").desc(), tie.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = lt.unionByName(rt)
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return (
        carried.filter(F.col("_side") == 0)
        .drop("_k", "_t", "_side", *[f"_r_{c}" for c in right_cols])
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Forward as-of: for each left row, the EARLIEST right row with
    right_ts >= left_ts per key — optionally only if it falls within
    ``tolerance`` (a SQL interval literal body, e.g. ``'30 DAYS'``);
    outside the tolerance the asof columns are NULL.

    Same one-shuffle union + window construction as :func:`asof_join`,
    mirrored: the window frame looks FORWARD (current row to unbounded
    following) and takes the first non-null right attribute. A right
    row exactly at the left timestamp matches; right ties on the
    timestamp resolve to the smallest right id."""
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_side"),
        "*",
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in right_cols
        ],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    # Tie-break among right rows sharing a timestamp by the raw first
    # right column (any orderable type). A cast-to-long here would
    # NULL out non-numeric ids and make tie resolution nondeterministic;
    # nulls sort first so genuinely-null ids still order stably.
    tie = F.col(f"_r_{right_cols[0]}")
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), tie.asc_nulls_first())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = lt.unionByName(rt).select(
        "*",
        *[
            F.first(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
        F.first("_r_ts", ignorenulls=True).over(w).alias("_asof_ts"),
    )
    out = carried.filter(F.col("_side") == 0)
    if tolerance is not None:
        in_tol = F.col("_asof_ts") <= F.expr(
            f"_t + INTERVAL {tolerance}"
        )
        out = out.select(
            *[c for c in out.columns if not c.startswith("asof_")],
            *[
                F.when(in_tol, F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in right_cols
            ],
        )
    return out.drop(
        "_k", "_t", "_side", "_asof_ts", "_r_ts",
        *[f"_r_{c}" for c in right_cols],
    )


def _q_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event: the user's most recent order at/before the
    event time (+ its total price)."""
    events = catalog.load_events(spark, sf_dir).select("event_id", "user_id", "ts")
    orders = catalog.load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    out = asof_join(
        events,
        orders.withColumnRenamed("o_custkey", "user_id"),
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_o_orderkey").alias("last_orderkey"),
    )


ASOF_DUCK = """
WITH tagged AS (
  SELECT user_id AS k, ts AS t, 0 AS side, event_id,
         CAST(NULL AS BIGINT) AS r_orderkey
  FROM events
  UNION ALL
  SELECT o_custkey AS k, o_orderdate AS t, 1 AS side,
         CAST(NULL AS BIGINT) AS event_id, o_orderkey AS r_orderkey
  FROM orders
),
carried AS (
  SELECT k, side, event_id,
         last_value(r_orderkey IGNORE NULLS) OVER (
           PARTITION BY k
           ORDER BY t, side DESC, coalesce(r_orderkey, -1)
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS last_orderkey
  FROM tagged
)
SELECT event_id, k AS user_id, last_orderkey
FROM carried WHERE side = 0
"""


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: tuple[str, str],
    left_ts: str,
    right_ts: str,
    lower,
    upper,
) -> DataFrame:
    """left ⋈ right on key equality AND right_ts in
    [left_ts + lower, left_ts + upper). Shuffle on the equality key;
    the range predicate rides the join condition."""
    lk, rk = on
    return left.join(
        right,
        (F.col(lk) == F.col(rk))
        & (F.col(right_ts) >= F.col(left_ts) + F.expr(lower))
        & (F.col(right_ts) < F.col(left_ts) + F.expr(upper)),
    )


def _q_followup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self range join: for each event, how many LATER events the same
    user fires within the following hour — the follow-up/burst-count
    shape (events and orders fixtures don't overlap in time, so the
    self-join is the meaningful range-join exercise)."""
    events = catalog.load_events(spark, sf_dir).select("event_id", "user_id", "ts")
    later = events.select(
        F.col("user_id").alias("user_b"),
        F.col("event_id").alias("event_b"),
        F.col("ts").alias("ts_b"),
    )
    joined = range_join(
        events,
        later,
        on=("user_id", "user_b"),
        left_ts="ts",
        right_ts="ts_b",
        lower="INTERVAL 0 SECOND",
        upper="INTERVAL 1 HOUR",
    ).filter(F.col("event_b") != F.col("event_id"))
    return (
        events.join(
            joined.groupBy("event_id").agg(F.count("*").alias("n_followups")),
            "event_id",
            "left",
        )
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_followups", F.lit(0)).alias("n_followups"),
        )
    )


RANGE_DUCK = """
WITH followups AS (
  SELECT a.event_id, count(*) AS n_followups
  FROM events a JOIN events b
    ON a.user_id = b.user_id
   AND b.ts >= a.ts + INTERVAL 0 SECOND
   AND b.ts <  a.ts + INTERVAL 1 HOUR
   AND b.event_id <> a.event_id
  GROUP BY a.event_id
)
SELECT e.event_id, e.user_id, coalesce(f.n_followups, 0) AS n_followups
FROM events e LEFT JOIN followups f ON e.event_id = f.event_id
"""


def _q_asof_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: for each event, the user's next
    order within 30 days (NULL when none)."""
    events = catalog.load_events(spark, sf_dir).select("event_id", "user_id", "ts")
    orders = catalog.load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    out = asof_join_forward(
        events,
        orders.withColumnRenamed("o_custkey", "user_id"),
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey"],
        tolerance="30 DAYS",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_o_orderkey").alias("next_orderkey"),
    )


ASOF_FORWARD_DUCK = """
WITH tagged AS (
  SELECT user_id AS k, ts AS t, 0 AS side, event_id,
         CAST(NULL AS BIGINT) AS r_orderkey,
         CAST(NULL AS TIMESTAMP) AS r_ts
  FROM events
  UNION ALL
  SELECT o_custkey AS k, o_orderdate AS t, 1 AS side,
         CAST(NULL AS BIGINT) AS event_id, o_orderkey AS r_orderkey,
         o_orderdate AS r_ts
  FROM orders
),
carried AS (
  SELECT k, t, side, event_id,
         first_value(r_orderkey IGNORE NULLS) OVER w AS nxt,
         first_value(r_ts IGNORE NULLS) OVER w AS nxt_ts
  FROM tagged
  WINDOW w AS (
    PARTITION BY k
    ORDER BY t, side, coalesce(r_orderkey, -1)
    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
  )
)
SELECT event_id, k AS user_id,
       CASE WHEN nxt_ts <= t + INTERVAL 30 DAY THEN nxt END AS next_orderkey
FROM carried WHERE side = 0
"""


def gap_fill_ffill(
    events: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    step: str = "interval 6 hours",
) -> DataFrame:
    """Regular-grid resampling with forward fill: one row per (key,
    grid timestamp) carrying the latest observation at or before that
    instant — the time-series "gap fill + locf" operator.

    Composition, not a new kernel: grid = keys × sequence(t0, t1,
    step), then :func:`asof_join` (union + window, ONE shuffle on the
    key). Equal-timestamp duplicates are pre-collapsed to the max-id
    row so both engines resolve ties identically. Scale: the grid is
    |keys| × span/step rows — generated, never shuffled wider than
    the as-of window itself; the naive alternative (inequality join +
    argmax) is |grid|×|events-per-key| and is exactly what this
    avoids."""
    idc = "event_id"
    w = Window.partitionBy(key, ts).orderBy(F.col(idc).desc())
    dedup = (
        events.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min(ts)).alias("_t0"),
        F.date_trunc("hour", F.max(ts)).alias("_t1"),
    )
    grid = (
        events.select(key).distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            key,
            F.explode(
                F.sequence(F.col("_t0"), F.col("_t1"), F.expr(step))
            ).alias("g_ts"),
        )
    )
    return asof_join(
        grid,
        dedup.select(key, ts, idc, *value_cols),
        on=key,
        left_ts="g_ts",
        right_ts=ts,
        right_cols=[idc, *value_cols],
    )


def _q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.load_events(spark, sf_dir)
    filled = gap_fill_ffill(ev, key="user_id", ts="ts", value_cols=["value"])
    return filled.select(
        "user_id",
        F.date_format("g_ts", "yyyy-MM-dd HH:mm:ss").alias("grid_ts"),
        F.col("asof_event_id").alias("last_event_id"),
        F.col("asof_value").alias("last_value"),
    ).orderBy("user_id", "grid_ts")


GAP_FILL_DUCK = """
WITH dedup AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
  FROM (
    SELECT user_id, ts, event_id, value,
           row_number() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id DESC) AS rk
    FROM events
  ) WHERE rk = 1
),
bounds AS (
  SELECT date_trunc('hour', min(CAST(ts AS TIMESTAMP))) AS t0,
         date_trunc('hour', max(CAST(ts AS TIMESTAMP))) AS t1
  FROM events
),
grid AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 6 HOUR)) AS g_ts
  FROM (SELECT DISTINCT user_id FROM events) CROSS JOIN bounds
)
SELECT g.user_id,
       strftime(g.g_ts, '%Y-%m-%d %H:%M:%S') AS grid_ts,
       e.event_id AS last_event_id,
       e.value AS last_value
FROM grid g ASOF LEFT JOIN dedup e
  ON g.user_id = e.user_id AND g.g_ts >= e.ts
ORDER BY g.user_id, grid_ts
"""


QUERIES = {
    "asof_latest_order": _q_asof_latest_order,
    "asof_next_order_30d": _q_asof_next_order,
    "event_followups_within_hour": _q_followup_events,
    "events_gap_fill_ffill": _q_gap_fill,
}

ORACLES = {
    "asof_latest_order": ASOF_DUCK,
    "asof_next_order_30d": ASOF_FORWARD_DUCK,
    "event_followups_within_hour": RANGE_DUCK,
    "events_gap_fill_ffill": GAP_FILL_DUCK,
}
