"""Registry-wide physical-plan sweep (r13 verdict item 2).

Every driver-contract query's plan is audited for the three
scale-shape anti-patterns (plans/audit.py): unpartitioned data
windows, CartesianProduct, row-at-a-time Python UDFs. The per-round
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
# The sanctioned `_pid` prefix-sum windows and deliberate
# BroadcastNestedLoopJoin scorers are already excluded by the
# detector itself; this list is for anything else and must stay
# empty unless a reviewed entry documents why the shape is safe.
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
