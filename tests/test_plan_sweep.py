"""Registry-wide physical-plan sweep (r13 verdict item 2).

Every driver-contract query's plan is audited for the four
scale-shape anti-patterns (plans/audit.py): unpartitioned data
windows, CartesianProduct, row-at-a-time Python UDFs, and
unbounded-broadcast BroadcastNestedLoopJoins. The per-round
oracle gate (tools/verify_oracle.py) runs the same audit at sf0.01
and fails the query on violation; this pytest pins it at sf0.001 so
a regression is caught before any round close.

The r13 judge found three unpartitioned-window queries by hand
(docs_hybrid_rrf, docs_surprisal_rank, docs_vocab_coverage); this
sweep found three more (mru_captions, events_hist_quantiles,
customer_value_ntiles). All six are fixed — the assertion is empty.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from dataset_batch_processor_spark.plans import audit, explain

# Queries allowed to carry a named violation, each with a reason.
# The sanctioned `_pid` prefix-sum windows, structurally bounded BNLJ
# build sides (global agg / limit / literal leaves), and declared
# `_bb_` bounded broadcasts are already excluded by the detector
# itself; this list is for anything else and must stay empty unless
# a reviewed entry documents why the shape is safe.
ALLOWLIST: dict[str, set[str]] = {}


def test_detector_fires_on_naive_shapes(spark):
    """Self-validation: the audit must flag the three anti-patterns
    it exists to forbid (else an empty sweep proves nothing)."""
    spark.range(100).selectExpr("id", "id % 7 AS v").createOrReplaceTempView(
        "_sweep_naive"
    )
    naive_window = spark.sql(
        "SELECT id, sum(v) OVER (ORDER BY id) AS s FROM _sweep_naive"
    )
    assert any(
        v.startswith("unpartitioned-window")
        for v in audit.audit_df(naive_window)
    )

    # parenthesized ORDER BY expression (ADVICE r14: the old regex
    # truncated at the cast's ')' and missed the ASC marker)
    paren_window = spark.sql(
        "SELECT id, sum(v) OVER (ORDER BY CAST(id AS STRING)) AS s "
        "FROM _sweep_naive"
    )
    assert any(
        v.startswith("unpartitioned-window")
        for v in audit.audit_df(paren_window)
    ), "paren-wrapped unpartitioned ORDER BY must still fire"
    # pure-string probe of the depth scanner (engine-independent)
    assert audit.unpartitioned_windows(
        "windowspecdefinition(cast(x#1 as bigint) ASC NULLS FIRST, "
        "specifiedwindowframe(...))"
    )
    assert not audit.unpartitioned_windows(
        "windowspecdefinition(part#3, cast(x#1 as bigint) ASC NULLS "
        "FIRST, specifiedwindowframe(...))"
    )

    a = spark.range(50).selectExpr("id AS x")
    b = spark.range(50).selectExpr("id AS y")
    cart = a.hint("shuffle_replicate_nl").crossJoin(b)
    assert "cartesian" in audit.audit_df(cart)

    from pyspark.sql.functions import udf

    rowwise = spark.range(10).select(udf(lambda x: x + 1, "long")("id"))
    assert "rowwise-python" in audit.audit_df(rowwise)

    # and the sanctioned _pid totals window must NOT fire
    from dataset_batch_processor_spark.operators import textops

    ranked = textops.attach_rank(
        spark.range(100).selectExpr("id AS k"), ["k"], out_col="r"
    )
    assert audit.audit_df(ranked) == []


def test_bnlj_guard_fires_on_corpus_sized_broadcast(spark, sf_dir):
    """r14 verdict item 6: a BNLJ whose build side is a corpus-sized
    relation (no structural bound, no declared `_bb_` column) must be
    flagged; the sanctioned bounded shapes must not."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # corpus x corpus: broadcast side is an unbounded scan
    bad = docs.select("doc_id").crossJoin(
        F.broadcast(docs.select(F.col("doc_id").alias("other_id")))
    )
    assert any(
        v.startswith("bnlj-unbounded-broadcast")
        for v in audit.audit_df(bad)
    ), "corpus-sized broadcast build side must be flagged"

    # global aggregate (one row) -> bounded
    tot = docs.agg(F.count(F.lit(1)).alias("n"))
    ok_agg = docs.select("doc_id").crossJoin(F.broadcast(tot))
    assert audit.audit_df(ok_agg) == []

    # explicit limit (TakeOrderedAndProject) -> bounded
    panel = docs.select("doc_id").orderBy("doc_id").limit(10)
    ok_lim = docs.select(F.col("doc_id").alias("d2")).crossJoin(
        F.broadcast(panel)
    )
    assert audit.audit_df(ok_lim) == []

    # literal enumeration (explode over OneRowRelation) -> bounded
    lits = spark.sql("SELECT explode(array(1, 2, 3)) AS v")
    ok_lit = docs.select("doc_id").crossJoin(F.broadcast(lits))
    assert audit.audit_df(ok_lit) == []

    # declared bound: `_bb_` column on the broadcast side -> sanctioned
    decl = docs.groupBy((F.col("doc_id") % 8).alias("b")).agg(
        F.count(F.lit(1)).alias("_bb_cnt")
    )
    ok_decl = docs.select("doc_id").crossJoin(F.broadcast(decl))
    assert audit.audit_df(ok_decl) == []

    # same keyed aggregate WITHOUT the declaration -> flagged
    undecl = docs.groupBy((F.col("doc_id") % 8).alias("b")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bad_keyed = docs.select("doc_id").crossJoin(F.broadcast(undecl))
    assert any(
        v.startswith("bnlj-unbounded-broadcast")
        for v in audit.audit_df(bad_keyed)
    ), "keyed aggregate without _bb_ declaration must be flagged"


def test_every_registered_query_plan_is_scale_shaped(spark, sf_dir):
    """Build all registry DataFrames at sf0.001 and assert no plan
    violations outside the (empty) allowlist. ~3 min: the build step
    runs each query's real construction path, including staged
    fixtures and bounded collects — exactly what the driver runs."""
    bad = audit.audit_registry(spark, sf_dir)
    unexplained = {
        name: viol
        for name, viol in bad.items()
        if set(viol) - ALLOWLIST.get(name, set())
    }
    assert unexplained == {}, (
        f"scale-shape violations in {len(unexplained)} queries: "
        f"{unexplained}"
    )
