"""RLHF preference family: the oracle is pinned against an
independent plain-Python replay of the candidate windows, the integer
fluency scorer, and the tie rules; plus the selection-consistency laws
linking the three queries."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from dataset_batch_processor_spark.operators import preference
from dataset_batch_processor_spark.operators.textanalysis import STOPWORDS

SF = "/root/testdata/sf0.001"


def _h28(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def _cand(doc_id: int, text: str, k: int) -> str:
    off = _h28(f"{doc_id}:c{k}") % max(len(text) - preference.RESP_CHARS + 1, 1)
    return text[off : off + preference.RESP_CHARS]


def _score(resp: str) -> int:
    toks = [t for t in resp.split(" ") if t]
    n = len(toks)
    stop = sum(1 for t in toks if t in STOPWORDS)
    return stop * 1_000_000 // n + len(set(toks)) * 1000 // n


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, source FROM"
        f" read_parquet('{SF}/documents.parquet')"
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


def test_pref_pairs_match_python(docs):
    got = {r[0]: r[1:] for r in _duck(preference.PREF_PAIRS_DUCK)}
    assert len(got) == len(docs)
    n_swapped = 0
    for doc_id, text, _ in docs:
        a, b = _cand(doc_id, text, 0), _cand(doc_id, text, 1)
        sa, sb = _score(a), _score(b)
        chosen, rejected = (0, 1) if sa >= sb else (1, 0)
        cm = hashlib.md5((a if chosen == 0 else b).encode()).hexdigest()
        rm = hashlib.md5((b if chosen == 0 else a).encode()).hexdigest()
        assert got[doc_id] == (chosen, rejected, cm, rm, abs(sa - sb)), doc_id
        n_swapped += chosen
    # both orders really occur — the scorer is not a constant rank
    assert 0 < n_swapped < len(docs)


def test_rejection_sampling_matches_python(docs):
    got = {r[0]: r[1:] for r in _duck(preference.BESTOF_DUCK)}
    for doc_id, text, _ in docs:
        scores = [
            _score(_cand(doc_id, text, k))
            for k in range(preference.N_CANDIDATES)
        ]
        best = max(range(len(scores)), key=lambda k: (scores[k], -k))
        exp = (
            best,
            hashlib.md5(_cand(doc_id, text, best).encode()).hexdigest(),
            preference.N_CANDIDATES,
            max(scores),
            min(scores),
            max(scores) - min(scores),
            sum(scores) // preference.N_CANDIDATES,
        )
        assert got[doc_id] == exp, doc_id


def test_winrate_consistent_with_bestof(docs):
    best = {r[0]: r[1] for r in _duck(preference.BESTOF_DUCK)}
    srcs = {d: s for d, _, s in docs}
    from collections import Counter

    exp = Counter((srcs[d], k) for d, k in best.items())
    per_src = Counter(srcs.values())
    got = {(r[0], r[1]): (r[2], r[3]) for r in _duck(preference.WINRATE_DUCK)}
    assert got == {
        (s, k): (n, n * 1_000_000 // per_src[s]) for (s, k), n in exp.items()
    }
    # every policy wins somewhere — seeded windows are unbiased
    assert len({k for _, k in got}) == preference.N_CANDIDATES


def test_spark_pairs_match_oracle(spark, sf_dir):
    got = sorted(
        tuple(r)
        for r in preference.QUERIES["docs_pref_pairs"](spark, sf_dir).collect()
    )
    exp = sorted(tuple(r) for r in _duck(preference.PREF_PAIRS_DUCK))
    assert got == exp


def test_margin_hist_reconciles_with_pairs(docs):
    hist = _duck(preference.MARGIN_HIST_DUCK)
    pairs = _duck(preference.PREF_PAIRS_DUCK)
    margins = [r[5] for r in pairs]
    from collections import Counter

    exp = Counter(min(m // preference.MARGIN_BUCKET, 9) for m in margins)
    got = {r[0]: r[1] for r in hist}
    assert got == dict(exp)
    for b, n, mn, mx in hist:
        bucket_ms = [
            m for m in margins if min(m // preference.MARGIN_BUCKET, 9) == b
        ]
        assert (mn, mx) == (min(bucket_ms), max(bucket_ms)), b
    assert sum(got.values()) == len(pairs)


# ------------------------------------------------ Bradley-Terry fit


def _pairwise_rows():
    return [
        (int(ki), int(kj), int(n), int(w))
        for ki, kj, n, w in _duck(
            f"WITH {preference._chain('duck', preference.N_CANDIDATES)}"
            f"{preference._PAIRWISE_TAIL}"
        )
    ]


def test_bt_oracle_matches_python_trajectory():
    """The unrolled DuckDB replay equals the driver-side exact-integer
    MM fit row for row (the DoReMi trajectory-parity test shape)."""
    got = [tuple(r) for r in _duck(preference.BT_STRENGTHS_DUCK)]
    exp = [tuple(r) for r in preference.bt_trajectory(_pairwise_rows())]
    assert got == exp


def test_bt_strengths_consistent_with_winrate():
    """Balanced complete design (every policy plays every other on
    every doc): BT strength order must match total-win order, the
    fitted summary agreeing with the gated win-rate rollup."""
    rows = preference.bt_trajectory(_pairwise_rows())
    assert len(rows) == preference.N_CANDIDATES
    by_wins = sorted(rows, key=lambda r: r[1])
    by_strength = sorted(rows, key=lambda r: r[2])
    assert [r[0] for r in by_wins] == [r[0] for r in by_strength]
    # normalization: Q6 within trunc slack; every strength positive
    tot = sum(r[2] for r in rows)
    assert 1_000_000 - preference.N_CANDIDATES <= tot <= 1_000_000
    assert all(r[2] >= 1 for r in rows)
    # balanced design: n_games identical for every pair
    n_games = {n for _, _, n, _ in _pairwise_rows()}
    assert len(n_games) == 1


def test_bt_fit_separates_a_planted_lopsided_matrix():
    """Sanity on the estimator itself, not the fixture: a policy that
    wins 90% of its games against everyone must land a strength above
    every uniform-ish opponent's."""
    n = 100
    rows = [
        (0, 1, n, 90), (0, 2, n, 90), (0, 3, n, 90),
        (1, 2, n, 50), (1, 3, n, 50), (2, 3, n, 50),
    ]
    fit = {p: s for p, _, s in preference.bt_trajectory(rows)}
    assert fit[0] > max(fit[1], fit[2], fit[3]) * 2


# --------------------------------- reward-ensemble disagreement


def _score_b(resp: str) -> int:
    toks = [t for t in resp.split(" ") if t]
    return len(set(toks)) * 1_000_000 // len(toks) + len(toks) * 1000


def test_ensemble_disagreement_matches_python(docs):
    got = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in _duck(preference.ENSEMBLE_DUCK)
    }
    assert len(got) == len(docs)
    n_disagree = 0
    for doc_id, text, _src in docs:
        cands = [
            _cand(doc_id, text, k) for k in range(preference.N_CANDIDATES)
        ]
        sa = [_score(c) for c in cands]
        sb = [_score_b(c) for c in cands]
        best_a = max(range(len(sa)), key=lambda k: (sa[k], -k))
        best_b = max(range(len(sb)), key=lambda k: (sb[k], -k))
        regret = sa[best_a] - sa[best_b]
        assert got[doc_id] == (best_a, best_b, best_a == best_b, regret), (
            doc_id
        )
        n_disagree += best_a != best_b
    # the audit carries signal on the fixture: the two reward models
    # genuinely disagree on a nontrivial share of prompts
    assert n_disagree > 0
    # when the scorers agree the regret is exactly zero
    for doc_id, (ba, bb, agree, regret) in got.items():
        if agree:
            assert regret == 0, doc_id
        assert regret >= 0, doc_id


def test_ensemble_spark_matches_oracle(spark, sf_dir):
    got = sorted(
        tuple(r)
        for r in preference.QUERIES[
            "docs_reward_ensemble_disagreement"
        ](spark, sf_dir).collect()
    )
    exp = sorted(tuple(r) for r in _duck(preference.ENSEMBLE_DUCK))
    assert got == exp


def test_length_bias_audit_catches_planted_slice(docs):
    """docs_pref_length_bias (VERDICT r11 next #4) vs an independent
    Python replay, and the audit's point: the planted verbose-winner
    slice (doc_id % 5 == 3) must show ZERO mass at negative
    length-delta buckets while the organic slice spreads across both
    signs."""
    from collections import Counter

    exp = Counter()
    for doc_id, text, _src in docs:
        a, b = _cand(doc_id, text, 0), _cand(doc_id, text, 1)
        na = len([t for t in a.split(" ") if t])
        nb = len([t for t in b.split(" ") if t])
        planted = doc_id % 5 == 3
        if planted:
            a_wins = na > nb or (na == nb and _score(a) >= _score(b))
        else:
            a_wins = _score(a) >= _score(b)
        delta = (na - nb) if a_wins else (nb - na)
        clamp = preference.LEN_BIAS_CLAMP
        exp[("planted" if planted else "organic",
             max(-clamp, min(clamp, delta)))] += 1

    rows = _duck(preference.LEN_BIAS_DUCK)
    got = {(r[0], r[1]): r[2] for r in rows}
    assert got == dict(exp)
    totals = Counter()
    for (sl, _d), n in exp.items():
        totals[sl] += n
    for sl, d, n, ppm in rows:
        assert ppm == n * 1_000_000 // totals[sl]
    # the audit catches the plant: verbose winners never lose length
    assert all(d >= 0 for (sl, d) in got if sl == "planted")
    # and the organic scorer genuinely spreads across both signs
    assert any(d < 0 for (sl, d) in got if sl == "organic")
    assert any(d > 0 for (sl, d) in got if sl == "organic")


def test_length_bias_spark_matches_oracle(spark, sf_dir):
    got = sorted(
        tuple(r)
        for r in preference.QUERIES["docs_pref_length_bias"](
            spark, sf_dir
        ).collect()
    )
    exp = sorted(tuple(r) for r in _duck(preference.LEN_BIAS_DUCK))
    assert got == exp


def test_margin_agreement_curve(docs):
    """Calibration audit: replay both scorers in Python; the curve's
    per-bucket pair counts must equal the margin histogram's, and
    agreement must reconcile with the ensemble tie rule exactly."""
    got = {r[0]: r[1:] for r in _duck(preference.CALIB_DUCK)}
    hist = {r[0]: r[1] for r in _duck(preference.MARGIN_HIST_DUCK)}
    assert {b: v[0] for b, v in got.items()} == hist

    buckets: dict[int, list[int]] = {}
    for doc_id, text, _src in docs:
        r0, r1 = _cand(doc_id, text, 0), _cand(doc_id, text, 1)
        t0 = [t for t in r0.split(" ") if t]
        t1 = [t for t in r1.split(" ") if t]
        a0, a1 = _score(r0), _score(r1)
        b0 = len(set(t0)) * 1_000_000 // len(t0) + len(t0) * 1000
        b1 = len(set(t1)) * 1_000_000 // len(t1) + len(t1) * 1000
        bucket = min(abs(a0 - a1) // preference.MARGIN_BUCKET, 9)
        agree = (a0 >= a1) == (b0 >= b1)
        buckets.setdefault(bucket, []).append(agree)
    for b, marks in buckets.items():
        n, n_agree, ppm = got[b]
        assert n == len(marks)
        assert n_agree == sum(marks)
        assert ppm == sum(marks) * 1_000_000 // len(marks)
