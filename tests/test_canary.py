"""Canary plant/exposure family: plain-Python replay of the plant,
the window geometry, and the leak mechanism (a rollout leaks iff its
window covers the appended canary span), plus card reconciliation."""

from __future__ import annotations

import hashlib

import duckdb

from dataset_batch_processor_spark.operators import canary as cn
from dataset_batch_processor_spark.operators.rlvr import (
    N_ROLLOUTS,
    RESP_CHARS,
)

SF = "/root/testdata/sf0.001"


def _h28(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def _plant(doc_id: int, text: str):
    mark = "CANARY-" + hashlib.md5(f"{doc_id}:canary".encode()).hexdigest()[:12]
    if doc_id % cn.CANARY_MOD == cn.CANARY_RESIDUE:
        return text + " " + mark, mark, True
    return text, mark, False


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    out = con.execute(sql).fetchall()
    con.close()
    return out


def _docs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_plant_manifest_matches_python():
    got = {r[0]: r[1:] for r in _duck(cn.PLANT_DUCK)}
    want = {}
    for doc_id, text in _docs():
        ptext, mark, planted = _plant(doc_id, text)
        if planted:
            want[doc_id] = (
                mark,
                hashlib.md5(ptext.encode()).hexdigest(),
                len(ptext),
            )
    assert got == want
    assert len(got) > 0


def test_exposure_matches_window_overlap_replay():
    """Ground truth: rollout r leaks iff its window [o, o+39] covers
    the canary span [L-19, L-1] of the planted text — replay offsets
    and check both the per-doc scan and the corpus card."""
    exposure = {r[0]: r[1:] for r in _duck(cn.EXPOSURE_DUCK)}
    want_leaks: dict[int, int] = {}
    for doc_id, text in _docs():
        ptext, mark, planted = _plant(doc_id, text)
        if not planted:
            continue
        L = len(ptext)
        n_leak = 0
        for r in range(N_ROLLOUTS):
            off = _h28(f"{doc_id}:x{r}") % max(L - RESP_CHARS + 1, 1)
            window = ptext[off : off + RESP_CHARS]
            covered = off <= L - len(mark) and off + RESP_CHARS >= L
            assert (mark in window) == covered  # mechanism, not accident
            n_leak += mark in window
        want_leaks[doc_id] = n_leak
    assert set(exposure) == set(want_leaks)
    for doc_id, n_leak in want_leaks.items():
        got_n, got_leaked, got_ppm = exposure[doc_id]
        assert got_n == n_leak
        assert got_leaked == (n_leak > 0)
        assert got_ppm == n_leak * 1_000_000 // N_ROLLOUTS
    # the fixture must exercise both leaked and clean planted docs
    vals = set(want_leaks.values())
    assert 0 in vals and any(v > 0 for v in vals)

    ((n_planted, n_docs_leaked, n_rollouts, ppm),) = _duck(cn.CARD_DUCK)
    assert n_planted == len(want_leaks)
    assert n_docs_leaked == sum(1 for v in want_leaks.values() if v > 0)
    assert n_rollouts == sum(want_leaks.values())
    assert ppm == n_rollouts * 1_000_000 // (n_planted * N_ROLLOUTS)
