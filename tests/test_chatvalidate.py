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


def test_sft_data_card_reconciles_with_component_gates(spark, sf_dir, detail):
    """The card composes the gated chains verbatim — its per-source
    numbers must reconcile with independent recomputation from the
    component gates' own outputs."""
    from dataset_batch_processor_spark.operators import chat, datacard, decontam

    card = {
        r["source"]: r
        for r in datacard.QUERIES["docs_sft_data_card"](
            spark, sf_dir
        ).collect()
    }
    docs = catalog.load_table(spark, sf_dir, "documents")
    src_of = {
        r["doc_id"]: r["source"]
        for r in docs.select("doc_id", "source").collect()
    }
    assert sum(r["n_convs"] for r in card.values()) == len(src_of)

    # keep_ppm from the validation detail
    from collections import Counter, defaultdict

    per_src = defaultdict(list)
    for doc_id, r in detail.items():
        per_src[src_of[doc_id]].append(r)
    for src, rows in per_src.items():
        keep = sum(1 for r in rows if r["decision"] == "keep")
        assert card[src]["keep_ppm"] == keep * 1_000_000 // len(rows), src
        # top quarantine reason: count desc, reason asc, 'none' if all keep
        q = Counter(r["reason"] for r in rows if r["decision"] != "keep")
        expect = (
            sorted(q.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            if q else "none"
        )
        assert card[src]["top_quarantine_reason"] == expect, src

    # decontam_ppm from the gated leak rows
    leak_docs = {
        r["doc_id"]
        for r in decontam.QUERIES["docs_chat_decontam"](
            spark, sf_dir
        ).collect()
    }
    for src, rows in per_src.items():
        n_leak = sum(
            1 for d in leak_docs if src_of[d] == src
        )
        assert card[src]["decontam_ppm"] == (
            n_leak * 1_000_000 // len(rows)
        ), src

    # mask_char_ppm from the gated render + mask rows
    docs.createOrReplaceTempView("documents")
    render_len = {
        r["doc_id"]: r["render_len"]
        for r in spark.sql(chat.CHAT_RENDER_SPARK).collect()
    }
    mask_chars = {
        r["doc_id"]: r["mask_chars"]
        for r in spark.sql(chat.CHAT_LOSS_MASK_SPARK).collect()
    }
    for src, rows in per_src.items():
        ids = [d for d, s in src_of.items() if s == src]
        tot_r = sum(render_len[d] for d in ids)
        tot_m = sum(mask_chars.get(d, 0) for d in ids)
        assert card[src]["mask_char_ppm"] == tot_m * 1_000_000 // tot_r, src
