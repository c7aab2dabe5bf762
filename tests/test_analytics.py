"""Analytics wave: funnel / cohort / SCD2 / quality / profile.

Correctness is oracled (tools/verify_oracle.py, driver gate); tests
here pin semantics on hand-built micro-fixtures plus the plan shapes
the module docstring claims."""

from __future__ import annotations

import datetime

from dataset_batch_processor_spark.operators import analytics
from dataset_batch_processor_spark.plans import explain


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp"
    )


def _run_sql(spark, sql, **views):
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return spark.sql(sql)


TS = datetime.datetime


def test_funnel_requires_strict_stage_order(spark):
    ev = _ev(
        spark,
        [
            # u1: full ordered funnel
            (1, "view", TS(2024, 1, 1, 10)),
            (1, "click", TS(2024, 1, 1, 11)),
            (1, "purchase", TS(2024, 1, 1, 12)),
            # u2: purchase BEFORE click -> counts for view+click only
            (2, "view", TS(2024, 1, 2, 10)),
            (2, "purchase", TS(2024, 1, 2, 10, 30)),
            (2, "click", TS(2024, 1, 2, 11)),
            # u3: click with no prior view -> view stage only via
            # its later view; click at same ts as view is NOT after
            (3, "view", TS(2024, 1, 3, 9)),
            (3, "click", TS(2024, 1, 3, 9)),
        ],
    )
    out = {
        r["stage"]: r["n_users"]
        for r in _run_sql(spark, analytics.FUNNEL_SQL, events=ev).collect()
    }
    assert out == {"view": 3, "click_after_view": 2, "purchase_after_click": 1}


def test_cohort_retention_week_offsets(spark):
    # two users in the same cohort week, one returning 2 weeks later
    ev = _ev(
        spark,
        [
            (1, "view", TS(2024, 1, 1)),     # day 19723 -> week 2817
            (1, "view", TS(2024, 1, 16)),    # +2 weeks
            (2, "view", TS(2024, 1, 2)),     # same cohort week
        ],
    )
    rows = _run_sql(spark, analytics.COHORT_SPARK, events=ev).collect()
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"] for r in rows}
    cohort = min(k[0] for k in got)
    assert got[(cohort, 0)] == 2
    assert got[(cohort, 2)] == 1


def test_scd2_change_points_and_closing_dates(spark):
    orders = spark.createDataFrame(
        [
            (1, 10, "2-HIGH", TS(2024, 1, 1)),
            (2, 10, "2-HIGH", TS(2024, 2, 1)),   # no change -> absorbed
            (3, 10, "5-LOW", TS(2024, 3, 1)),    # regime 2
            (4, 10, "2-HIGH", TS(2024, 4, 1)),   # regime 3 (back-and-forth kept)
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderpriority string, o_orderdate timestamp",
    )
    rows = _run_sql(spark, analytics.SCD2_SPARK, orders=orders).collect()
    hist = [(r["version"], r["priority"], r["effective_from"], r["effective_to"]) for r in rows]
    assert hist == [
        (1, "2-HIGH", "2024-01-01", "2024-03-01"),
        (2, "5-LOW", "2024-03-01", "2024-04-01"),
        (3, "2-HIGH", "2024-04-01", "9999-12-31"),
    ]


def test_scd2_single_exchange(spark, sf_dir):
    """Both windows share one (custkey) hash partitioning — the only
    other Exchange is the final presentation ORDER BY's range
    partition. A third exchange would mean the second window
    re-shuffled."""
    df = analytics.QUERIES["customer_scd2_dim"](spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert explain.count_exchanges(df) == 2
    assert plan.count("hashpartitioning(o_custkey") == 1, plan


def test_quality_report_flags_violations(spark):
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 100.0, TS(2024, 1, 1), "2-HIGH"),
            (1, 10, "O", 50.0, TS(2024, 1, 2), "2-HIGH"),     # dup pk
            (2, None, "O", -5.0, TS(2024, 1, 3), "WHAT"),     # null fk, bad price+domain
            (3, 99, "O", 10.0, TS(2024, 1, 4), "5-LOW"),      # orphan fk
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [(10, "a", 1, 0.0, "SEG")],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    got = {
        r["metric"]: r["value"]
        for r in _run_sql(
            spark, analytics.QUALITY_SQL, orders=orders, customer=customer
        ).collect()
    }
    assert got == {
        "n_rows": 4,
        "custkey_nulls": 1,
        "totalprice_nulls": 0,
        "pk_duplicates": 1,
        "nonpositive_price": 1,
        "bad_priority_domain": 1,
        # NOT EXISTS is false for NULL custkey (no row matches, so it
        # IS an orphan): row 2 and row 3 both orphaned
        "fk_orphans": 2,
    }


def test_profile_reads_only_profiled_columns(spark, sf_dir):
    df = analytics.QUERIES["lineitem_profile"](spark, sf_dir)
    for cols in explain.read_schema_columns(df):
        assert set(cols) <= set(analytics._PROFILE_COLS), cols


def test_data_card_consistency(spark, sf_dir):
    """The card's numbers must reconcile with direct recomputation:
    sums over sources == corpus totals; pass rate consistent with the
    gated gopher gate; dup_ppm zero iff no intra-source text dups."""
    from dataset_batch_processor_spark import catalog as cat
    from dataset_batch_processor_spark.operators import datacard, webquality

    rows = {r["source"]: r for r in datacard._q_data_card(spark, sf_dir).collect()}
    docs = cat.load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows.values()) == docs.count()
    gq = webquality.gopher_quality(docs)
    n_pass = gq.filter("passes_gopher").count()
    from pyspark.sql import functions as F

    # exact reconciliation: recompute per-source pass counts
    per_src = {
        r["source"]: r["n"]
        for r in gq.join(docs.select("doc_id", "source"), "doc_id")
        .filter("passes_gopher")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for s, r in rows.items():
        exp = per_src.get(s, 0) * 1_000_000 // r["n_docs"]
        assert r["gopher_pass_ppm"] == exp, s
        assert 0 <= r["dup_ppm"] <= 1_000_000
        assert r["majority_lang"] in ("en", "de", "es", "fr", "zh")
    assert sum(per_src.values()) == n_pass
