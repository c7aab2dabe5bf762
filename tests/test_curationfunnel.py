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


def test_zero_token_docs_fail_lang_gate_not_vanish(spark, tmp_path):
    """A whitespace-only document has n_words from split() but zero
    non-empty tokens — it must appear in the gate table with
    gate_lang = False (review finding r8), and the DuckDB oracle must
    agree on the population."""
    import duckdb
    import pandas as pd

    from dataset_batch_processor_spark.operators.curationfunnel import (
        FUNNEL_DUCK,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                " " * 25,                       # whitespace-only
                "the quick brown fox " * 10,    # healthy english doc
                "x",                            # short doc
            ],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [25, 200, 1],
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(docs).write.parquet(f"{sf}/documents.parquet")

    from dataset_batch_processor_spark.operators import curationfunnel as cf

    g = {r["doc_id"]: r.asDict() for r in
         cf.doc_gates(spark, sf).collect()}
    assert set(g) == {1, 2, 3}          # nobody vanishes
    assert g[1]["gate_lang"] is False   # zero tokens -> 'und'
    assert g[2]["gate_lang"] is True

    rows = cf._q_funnel(spark, sf).collect()
    assert rows[0]["n_in"] == 3

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    duck = con.execute(FUNNEL_DUCK).fetchall()
    spark_rows = [
        (r["stage_idx"], r["stage"], r["n_in"], r["n_killed"], r["n_out"])
        for r in rows
    ]
    assert [tuple(r) for r in duck] == spark_rows
