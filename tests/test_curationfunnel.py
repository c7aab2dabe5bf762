"""Curation funnel (operators/curationfunnel.py): stage chaining
invariants and funnel-vs-attribution consistency. Value correctness
vs DuckDB is the oracle gate's job (docs_curation_funnel /
docs_funnel_attribution); these tests pin the internal algebra the
oracle cannot see — that the two registered queries agree with each
other and with the per-gate operators they compose."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataset_batch_processor_spark.operators import curationfunnel as cf


def test_funnel_stage_chaining(spark, sf_dir):
    rows = cf._q_funnel(spark, sf_dir).collect()
    assert [r["stage"] for r in rows] == list(cf.GATES)
    for r in rows:
        assert r["n_out"] == r["n_in"] - r["n_killed"]
        assert r["n_killed"] >= 0
    for prev, nxt in zip(rows, rows[1:]):
        assert nxt["n_in"] == prev["n_out"]
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert rows[0]["n_in"] == total


def test_attribution_counts_match_funnel_kills(spark, sf_dir):
    funnel = {r["stage"]: r["n_killed"]
              for r in cf._q_funnel(spark, sf_dir).collect()}
    attr = {
        r["first_fail"]: r["n"]
        for r in cf._q_attribution(spark, sf_dir)
        .groupBy("first_fail")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for stage in cf.GATES:
        assert attr.get(stage, 0) == funnel[stage], stage
    total = sum(attr.values())
    assert attr["pass"] == total - sum(funnel.values())


def test_gates_agree_with_component_operators(spark, sf_dir):
    """gate_dedup and gate_neardup must equal what the standalone
    dedup operators report (the funnel composes, never re-derives)."""
    from dataset_batch_processor_spark.operators.components import (
        doc_dup_labels,
    )

    g = cf.doc_gates(spark, sf_dir)
    nd_victims = {
        r["node"]
        for r in doc_dup_labels(spark, sf_dir)
        .filter(F.col("node") != F.col("comp"))
        .collect()
    }
    for row in g.select("doc_id", "gate_neardup").collect():
        assert row["gate_neardup"] == (row["doc_id"] not in nd_victims)
