"""Conversation-validation gate: every planted defect class is caught,
every clean conversation passes, and the counts rollup is consistent
with the per-doc detail (VERDICT r10 missing #1 'Done' criteria)."""

from __future__ import annotations

import pytest

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import chat, chatvalidate
from dataset_batch_processor_spark.plans import explain

PLANTED = {1, 2, 3, 4, 6, 9}


@pytest.fixture(scope="module")
def detail(spark, sf_dir):
    rows = chatvalidate.QUERIES["docs_chat_validate"](spark, sf_dir).collect()
    return {r["doc_id"]: r for r in rows}


def test_one_row_per_document(detail, spark, sf_dir):
    n_docs = catalog.load_table(spark, sf_dir, "documents").count()
    assert len(detail) == n_docs


def test_system_turn_plants_caught(detail):
    for doc_id, r in detail.items():
        m = doc_id % chatvalidate.PLANT_MOD
        if m == 3:
            assert r["reason"] == "no_system", r
            assert r["n_sys"] == 0
        elif m == 4:
            assert r["reason"] == "multi_system", r
            assert r["n_sys"] == 2
        else:
            assert r["n_sys"] == 1


def test_role_break_plant_caught(detail):
    hit = 0
    for doc_id, r in detail.items():
        if doc_id % chatvalidate.PLANT_MOD == 1:
            if r["n_turns"] >= 2:  # plant applied (turn 1 exists)
                assert r["reason"] == "role_break", r
                hit += 1
            else:  # plant no-ops on one-turn conversations
                assert r["reason"] in ("ok", "dangling_user_tail"), r
    assert hit > 0, "fixture has no multi-turn doc in the m=1 class"


def test_empty_assistant_plants_caught(detail):
    hit = 0
    for doc_id, r in detail.items():
        if doc_id % chatvalidate.PLANT_MOD in (2, 9):
            if r["n_turns"] >= 2:
                assert r["reason"] == "empty_assistant", r
                hit += 1
    assert hit > 0


def test_refusal_plant_caught(detail):
    hit = 0
    for doc_id, r in detail.items():
        if doc_id % chatvalidate.PLANT_MOD == 6 and r["n_turns"] >= 2:
            assert r["reason"] == "refusal_boilerplate", r
            hit += 1
    assert hit > 0


def test_clean_conversations_pass_and_tail_rule(detail, spark, sf_dir):
    """Unplanted docs: reason is 'ok' exactly when the turn count is
    even (turn 0 = user, so even counts end on assistant), else the
    organic dangling_user_tail."""
    clean = [
        r for d, r in detail.items()
        if d % chatvalidate.PLANT_MOD not in PLANTED
    ]
    assert clean
    for r in clean:
        expected = "ok" if r["n_turns"] % 2 == 0 else "dangling_user_tail"
        assert r["reason"] == expected, r
        assert r["decision"] == ("keep" if expected == "ok" else "quarantine")


def test_counts_match_detail(detail, spark, sf_dir):
    counts = {
        (r["decision"], r["reason"]): r["n_convs"]
        for r in chatvalidate.QUERIES["docs_chat_validate_counts"](
            spark, sf_dir
        ).collect()
    }
    from collections import Counter

    derived = Counter(
        (r["decision"], r["reason"]) for r in detail.values()
    )
    assert counts == dict(derived)


def test_plan_no_cartesian_no_global_window(spark, sf_dir):
    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    for sql in (
        chatvalidate.CHAT_VALIDATE_SPARK,
        chatvalidate.CHAT_VALIDATE_COUNTS_SPARK,
    ):
        plan = explain.formatted_plan(spark.sql(sql))
        assert "CartesianProduct" not in plan, plan
        # the only windows are doc-keyed (turn assembly + lag)
        assert "SinglePartition" not in plan, plan


def test_validate_shares_chat_turn_chain():
    """The gate runs over chat.py's own parameterized CTE builders —
    never a drifted copy (memory: the .replace() retargeting trap)."""
    assert chat.toks_spark() in chatvalidate.CHAT_VALIDATE_SPARK
    assert chat.turns_spark() in chatvalidate.CHAT_VALIDATE_SPARK
    assert chat.toks_duck() in chatvalidate.CHAT_VALIDATE_DUCK
    assert chat.turns_duck() in chatvalidate.CHAT_VALIDATE_DUCK
