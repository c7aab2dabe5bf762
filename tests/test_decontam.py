"""Decontamination + n-gram Jaccard: golden tests on hand-built docs.

The sf-fixture correctness lives in tools/verify_oracle.py (DuckDB
hash parity); these tests pin the SEMANTICS on corpora small enough
to check by hand.
"""

from __future__ import annotations

import pytest

from dataset_batch_processor_spark.operators import decontam


def _run_on_docs(spark, docs, sql):
    spark.createDataFrame(
        docs, "doc_id long, text string"
    ).createOrReplaceTempView("documents")
    return spark.sql(sql)


def test_decontaminate_flags_verbatim_overlap(spark):
    eval_doc = "a b c d e f g h i j"  # doc_id 0 -> eval set (0 % 23 == 0)
    docs = [
        (0, eval_doc),
        # shares the 8-gram "a b c d e f g h" (and 2 more shifted ones)
        (1, "x a b c d e f g h i j y"),
        # same words, different order -> no 8-gram collision
        (2, "j i h g f e d c b a j i h g f e d c b a"),
        # too short for any 8-gram
        (3, "a b c"),
    ]
    rows = _run_on_docs(spark, docs, decontam.DECONTAMINATE_SPARK).collect()
    got = {r.doc_id: r.n_shared_grams for r in rows}
    # doc 1 shares exactly the 3 grams starting at a, b, c
    assert got == {1: 3}


def test_decontaminate_eval_docs_never_reported(spark):
    docs = [(0, "a b c d e f g h"), (23, "a b c d e f g h")]
    rows = _run_on_docs(spark, docs, decontam.DECONTAMINATE_SPARK).collect()
    assert rows == []  # both are eval docs (ids divisible by 23)


def test_ngram_jaccard_exact_value(spark):
    # doc 1: grams {abc, bcd}; doc 2: grams {abc, bcx}
    # jaccard = 1 shared / 3 union = 0.333333 -> below 0.5 threshold
    # doc 3 duplicates doc 1 -> jaccard 1.0
    docs = [
        (1, "a b c d"),
        (2, "a b c x"),
        (3, "a b c d"),
    ]
    rows = _run_on_docs(spark, docs, decontam.NGRAM_JACCARD_SPARK).collect()
    assert [(r.id1, r.id2, r.jaccard) for r in rows] == [(1, 3, 1.0)]


def test_ngram_jaccard_stop_gram_cutoff(spark):
    # one gram shared by MORE than DF_CAP docs must be dropped from the
    # index: no pair survives even though all docs are identical.
    docs = [(i, "a b c") for i in range(decontam.DF_CAP + 1)]
    rows = _run_on_docs(spark, docs, decontam.NGRAM_JACCARD_SPARK).collect()
    assert rows == []


@pytest.mark.parametrize("n_docs", [2, decontam.DF_CAP])
def test_ngram_jaccard_at_or_below_cutoff_survives(spark, n_docs):
    docs = [(i, "a b c") for i in range(n_docs)]
    rows = _run_on_docs(spark, docs, decontam.NGRAM_JACCARD_SPARK).collect()
    assert len(rows) == n_docs * (n_docs - 1) // 2
    assert all(r.jaccard == 1.0 for r in rows)


def test_ngram_jaccard_unfold_matches_self_join_spec(spark):
    """Round 15b: the driver entry's pair-unfold tail must emit the
    self-join spec's exact row set on the sf0.001 fixture (pairs,
    counts, AND the rounded jaccard values)."""
    from dataset_batch_processor_spark import catalog

    sf = "/root/testdata/sf0.001"
    catalog.load_table(spark, sf, "documents").createOrReplaceTempView(
        "documents"
    )
    spec = sorted(
        tuple(r) for r in spark.sql(decontam.NGRAM_JACCARD_SPARK).collect()
    )
    got = sorted(
        tuple(r)
        for r in decontam.QUERIES["docs_ngram_jaccard_pairs"](
            spark, sf
        ).collect()
    )
    assert got == spec and len(got) > 0


# ------------------------------------- turn-grain (chat) decontam


def test_chat_decontam_catches_exactly_the_planted_turns(spark):
    """Every doc in the plant class is flagged at turn 0 with the
    prompt's full gram count; no unplanted turn is flagged (organic
    fixture turns run 3-8 tokens — below the 8-gram width)."""
    from dataset_batch_processor_spark import catalog
    from dataset_batch_processor_spark.operators import decontam

    sf = "/root/testdata/sf0.001"
    got = {
        (r["doc_id"], r["turn_id"]): r["n_shared_grams"]
        for r in decontam.QUERIES["docs_chat_decontam"](spark, sf).collect()
    }
    doc_ids = [
        r["doc_id"]
        for r in catalog.load_table(spark, sf, "documents")
        .select("doc_id").collect()
    ]
    planted = {
        d for d in doc_ids
        if d % decontam.TURN_PLANT_MOD == decontam.TURN_PLANT_RESIDUE
    }
    assert set(got) == {(d, 0) for d in planted}
    for d in planted:
        prompt = decontam.BENCH_PROMPTS[d % len(decontam.BENCH_PROMPTS)]
        n_words = len(prompt.split())
        assert n_words >= decontam.DECON_N
        assert got[(d, 0)] == n_words - decontam.DECON_N + 1, d


def test_chat_decontam_plan_broadcasts_panel(spark):
    from dataset_batch_processor_spark import catalog
    from dataset_batch_processor_spark.operators import decontam
    from dataset_batch_processor_spark.plans import explain

    catalog.load_table(
        spark, "/root/testdata/sf0.001", "documents"
    ).createOrReplaceTempView("documents")
    plan = explain.formatted_plan(spark.sql(decontam.CHAT_DECONTAM_SPARK))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_decontam_report_reconciles_with_component_gates(spark):
    """The report card composes the gated screens verbatim — every
    per-source number must reconcile with an independent recomputation
    from the screens' own outputs."""
    from collections import defaultdict

    from dataset_batch_processor_spark import catalog
    from dataset_batch_processor_spark.operators import decontam

    sf = "/root/testdata/sf0.001"
    card = {
        r["source"]: r
        for r in decontam.QUERIES["docs_decontam_report"](
            spark, sf
        ).collect()
    }
    src_of = {
        r["doc_id"]: r["source"]
        for r in catalog.load_table(spark, sf, "documents")
        .select("doc_id", "source").collect()
    }
    exact = defaultdict(set)
    for r in decontam.QUERIES["docs_decontaminate"](spark, sf).collect():
        exact[src_of[r["doc_id"]]].add(r["doc_id"])
    bloom, bloom_fp = defaultdict(set), defaultdict(set)
    for r in decontam.QUERIES["docs_bloom_decontam"](spark, sf).collect():
        bloom[src_of[r["doc_id"]]].add(r["doc_id"])
        if r["n_exact_grams"] == 0:
            bloom_fp[src_of[r["doc_id"]]].add(r["doc_id"])
    turn = defaultdict(set)
    for r in decontam.QUERIES["docs_chat_decontam"](spark, sf).collect():
        turn[src_of[r["doc_id"]]].add(r["doc_id"])

    n_total = sum(r["n_docs"] for r in card.values())
    assert n_total == len(src_of)
    for src, r in card.items():
        assert r["ngram8_hit_docs"] == len(exact[src]), src
        assert r["bloom_hit_docs"] == len(bloom[src]), src
        assert r["bloom_fp_docs"] == len(bloom_fp[src]), src
        assert r["turn_hit_docs"] == len(turn[src]), src
        assert r["ngram8_ppm"] == (
            len(exact[src]) * 1_000_000 // max(r["n_train_docs"], 1)
        ), src
        assert r["turn_hit_ppm"] == (
            len(turn[src]) * 1_000_000 // max(r["n_docs"], 1)
        ), src
    # the Bloom screen over-approximates the exact screen per source
    # (an exactly-shared gram always sets all of its own bits)
    for src, r in card.items():
        assert r["bloom_hit_docs"] >= r["ngram8_hit_docs"], src
