"""RLVR family: the oracle is pinned against an independent
plain-Python replay of the rollout windows, the modal-token verifier,
and the containment grading; pass@k against a brute-force subset
enumeration of the Chen et al. estimator; and the cross-query
consistency laws (GRPO group sums, pass@1/pass@8 closed forms)."""

from __future__ import annotations

import hashlib
from collections import Counter
from itertools import combinations
from math import comb

import duckdb
import pytest

from dataset_batch_processor_spark.operators import rlvr

SF = "/root/testdata/sf0.001"


def _h28(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def _rollout(doc_id: int, text: str, r: int) -> str:
    off = _h28(f"{doc_id}:v{r}") % max(len(text) - rlvr.RESP_CHARS + 1, 1)
    return text[off : off + rlvr.RESP_CHARS]


def _answer(text: str) -> str:
    counts = Counter(t for t in text.split(" ") if t)
    return min(counts, key=lambda t: (-counts[t], t))


def _replay(docs):
    """{doc_id: (answer, [correct per rollout])}"""
    out = {}
    for doc_id, text in docs:
        ans = _answer(text)
        marks = [
            1 if f" {ans} " in f" {_rollout(doc_id, text, r)} " else 0
            for r in range(rlvr.N_ROLLOUTS)
        ]
        out[doc_id] = (ans, marks)
    return out


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    out = con.execute(sql).fetchall()
    con.close()
    return out


def test_verifier_grade_matches_python(docs):
    replay = _replay(docs)
    got = {r[0]: r[1:] for r in _duck(rlvr.GRADE_DUCK)}
    assert len(got) == len(docs)
    n_signal = 0
    for doc_id, text in docs:
        ans, marks = replay[doc_id]
        n_rolls, n_correct, n_distinct, pass1, has_signal, ans_md5 = got[
            doc_id
        ]
        assert n_rolls == rlvr.N_ROLLOUTS
        assert n_correct == sum(marks)
        assert n_distinct == len(
            {_rollout(doc_id, text, r) for r in range(rlvr.N_ROLLOUTS)}
        )
        assert pass1 == sum(marks) * 1_000_000 // rlvr.N_ROLLOUTS
        assert has_signal == (0 < sum(marks) < rlvr.N_ROLLOUTS)
        assert ans_md5 == hashlib.md5(ans.encode()).hexdigest()
        n_signal += has_signal
    # the fixture must exercise both signal and no-signal tasks
    assert 0 < n_signal < len(docs)


def test_passk_unbiased_against_subset_enumeration():
    # the estimator 1 - C(n-c,k)/C(n,k) IS the exact mean over all
    # C(n,k) rollout subsets of "subset contains a correct rollout"
    n = rlvr.N_ROLLOUTS
    for c in range(n + 1):
        marks = [1] * c + [0] * (n - c)
        for k in rlvr.PASS_KS:
            brute_num = sum(
                1 for s in combinations(range(n), k)
                if any(marks[i] for i in s)
            )
            assert comb(n, k) - comb(n - c, k) == brute_num


def test_passk_rollup_closed_forms(docs):
    grade = {r[0]: r[1:] for r in _duck(rlvr.GRADE_DUCK)}
    passk = {r[0]: (r[1], r[2]) for r in _duck(rlvr.PASSK_DUCK)}
    assert set(passk) == set(rlvr.PASS_KS)
    n_tasks = len(docs)
    cs = [g[1] for g in grade.values()]
    # k=1: per-task ppm equals pass1_ppm exactly (10^6 divisible by 8)
    assert passk[1] == (
        n_tasks,
        sum(c * 1_000_000 // 8 for c in cs) // n_tasks,
    )
    # k=n: solved iff any rollout correct
    assert passk[8] == (
        n_tasks,
        sum(1_000_000 for c in cs if c > 0) // n_tasks,
    )
    # per-task truncated estimator replay for the middle ks
    for k in (2, 4):
        want = (
            sum(
                1_000_000 - comb(8 - c, k) * 1_000_000 // comb(8, k)
                for c in cs
            )
            // n_tasks
        )
        assert passk[k][1] == want
    # monotone in k
    assert passk[1][1] <= passk[2][1] <= passk[4][1] <= passk[8][1]


def test_grpo_groups_center_exactly(docs):
    grade = {r[0]: r[1:] for r in _duck(rlvr.GRADE_DUCK)}
    rows = _duck(rlvr.GRPO_DUCK)
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for doc_id, rollout, correct, adv in rows:
        by_doc.setdefault(doc_id, []).append((correct, adv))
    signal_docs = {d for d, g in grade.items() if g[4]}
    assert set(by_doc) == signal_docs
    for doc_id, grp in by_doc.items():
        assert len(grp) == rlvr.N_ROLLOUTS
        c = grade[doc_id][1]
        # 10^6 is divisible by n=8, so each group centers to EXACTLY 0
        assert sum(adv for _, adv in grp) == 0
        for correct, adv in grp:
            assert adv == correct * 1_000_000 - c * 1_000_000 // 8


def test_verifier_dpo_pairs_match_replay(docs):
    """One pair per signal task: chosen = smallest correct rollout
    index, rejected = smallest incorrect; md5s match the windows."""
    replay = _replay(docs)
    texts = dict(docs)
    got = {r[0]: r[1:] for r in _duck(rlvr.DPO_DUCK)}
    want_ids = {
        d for d, (_a, m) in replay.items() if 0 < sum(m) < rlvr.N_ROLLOUTS
    }
    assert set(got) == want_ids
    for doc_id in want_ids:
        _ans, marks = replay[doc_id]
        chosen = marks.index(1)
        rejected = marks.index(0)
        c_r, r_r, c_md5, r_md5 = got[doc_id]
        assert (c_r, r_r) == (chosen, rejected)
        assert c_md5 == hashlib.md5(
            _rollout(doc_id, texts[doc_id], chosen).encode()
        ).hexdigest()
        assert r_md5 == hashlib.md5(
            _rollout(doc_id, texts[doc_id], rejected).encode()
        ).hexdigest()


def test_rlvr_curriculum_card(docs):
    """Phases balanced to +-1 task, difficulty monotone across phases
    (phase 0 easiest), signal counts reconcile with the grade rows."""
    replay = _replay(docs)
    rows = sorted(_duck(rlvr.CURR_DUCK))
    assert [r[0] for r in rows] == list(range(rlvr.N_CURR_PHASES))
    n = len(docs)
    assert sum(r[1] for r in rows) == n
    assert max(r[1] for r in rows) - min(r[1] for r in rows) <= 1
    # easy-to-hard: correctness ranges non-increasing across phases
    for a, b in zip(rows, rows[1:]):
        assert a[2] >= b[2]  # min_correct monotone non-increasing
        assert a[3] >= b[3]  # max_correct monotone non-increasing
    # replay the phase assignment exactly
    order = sorted(
        ((rlvr.N_ROLLOUTS - sum(m), d) for d, (_a, m) in replay.items())
    )
    want: dict[int, list[int]] = {}
    for rank, (_diff, d) in enumerate(order):
        want.setdefault(rank * rlvr.N_CURR_PHASES // n, []).append(d)
    for phase, n_tasks, mn, mx, n_signal in rows:
        members = want[phase]
        cs = [sum(replay[d][1]) for d in members]
        assert n_tasks == len(members)
        assert (mn, mx) == (min(cs), max(cs))
        assert n_signal == sum(1 for c in cs if 0 < c < rlvr.N_ROLLOUTS)


def test_source_passrate_reconciles_with_grade(docs):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    src_rows = con.execute(rlvr.SRC_PASS_DUCK).fetchall()
    doc_src = dict(
        con.execute("SELECT doc_id, source FROM documents").fetchall()
    )
    con.close()
    grade = {r[0]: r[1:] for r in _duck(rlvr.GRADE_DUCK)}
    by_src: dict[str, list] = {}
    for doc_id, g in grade.items():
        by_src.setdefault(doc_src[doc_id], []).append(g)
    assert {r[0] for r in src_rows} == set(by_src)
    for source, n_tasks, pass1_ppm, n_signal in src_rows:
        gs = by_src[source]
        assert n_tasks == len(gs)
        assert pass1_ppm == (
            sum(g[1] for g in gs) * 1_000_000
            // sum(g[0] for g in gs)
        )
        assert n_signal == sum(1 for g in gs if g[4])


def test_grading_chain_on_adversarial_texts():
    """Differential fuzz: the DuckDB chain vs the Python replay over
    synthetic docs exercising the edges the corpus fixture never hits
    — single-token docs, repeated-token docs, docs shorter than the
    window, and md5-hex-looking tokens."""
    import duckdb

    texts = [
        "x",
        "a a a a a a a a a a",
        "one two",
        " ".join(f"t{i}" for i in range(200)),
        "deadbeef " * 5,
        "short doc",
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") AS t(doc_id, text)"
    )
    got = {r[0]: r[1:] for r in con.execute(rlvr.GRADE_DUCK).fetchall()}
    con.close()
    replay = _replay(list(enumerate(texts)))
    assert set(got) == set(range(len(texts)))
    for i, t in enumerate(texts):
        ans, marks = replay[i]
        assert got[i][1] == sum(marks), (i, t)
        assert got[i][5] == hashlib.md5(ans.encode()).hexdigest()
        # degenerate docs: the window IS the doc, so every rollout
        # contains the modal token -> all-correct, no GRPO signal
        if len(t) <= rlvr.RESP_CHARS:
            assert got[i][1] == rlvr.N_ROLLOUTS and got[i][4] is False
