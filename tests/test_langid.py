"""Trained language-ID: the DuckDB oracle (driver-compared against the
Spark plan) is pinned against an INDEPENDENT plain-Python Naive-Bayes
reimplementation — md5 hashing, exact Q10 log2, smoothing, argmax
cascade all rebuilt from scratch — so both engines' agreement can't be
a shared misreading of the model."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb
import pytest

from dataset_batch_processor_spark.operators import langid
from dataset_batch_processor_spark.operators.bpe import _l2_int
from dataset_batch_processor_spark.operators.curation import TRAIN_PCT
from dataset_batch_processor_spark.operators.textanalysis import _MARKERS

SF = "/root/testdata/sf0.001"


def _h28(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def _is_train(doc_id: int) -> bool:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 100 < TRAIN_PCT


def _lid_text(text: str, lang: str) -> str:
    plant = (" ".join(_MARKERS[lang]) + " ") if lang in _MARKERS else ""
    return plant * (1 + len(text) // 40) + text


def _teacher(text: str) -> str:
    toks = [t for t in text.split(" ") if t]
    hits = {lg: sum(1 for t in toks if t in ws) for lg, ws in _MARKERS.items()}
    if all(v == 0 for v in hits.values()):
        return "und"
    if hits["en"] >= hits["fr"] and hits["en"] >= hits["de"] and hits["en"] >= hits["es"]:
        return "en"
    if hits["de"] >= hits["es"] and hits["de"] >= hits["fr"]:
        return "de"
    if hits["es"] >= hits["fr"]:
        return "es"
    return "fr"


def _feats(text: str) -> Counter:
    c: Counter = Counter()
    for p in range(len(text) - 1):
        c[_h28(text[p : p + 2]) % langid.LID_DIM] += 1
    return c


@pytest.fixture(scope="module")
def fitted():
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text, lang FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    rows = []  # (doc_id, teacher, is_train, feats)
    for doc_id, text, lang in docs:
        t = _lid_text(text, lang)
        teach = _teacher(t)
        if teach == "und":
            continue
        rows.append((doc_id, teach, _is_train(doc_id), _feats(t)))
    counts = {(lg, d): 0 for lg in langid.LANGS for d in range(langid.LID_DIM)}
    nprior = {lg: 0 for lg in langid.LANGS}
    for _, teach, train, f in rows:
        if not train:
            continue
        nprior[teach] += 1
        for d, c in f.items():
            counts[(teach, d)] += c
    logp = {}
    for lg in langid.LANGS:
        tot = sum(counts[(lg, d)] for d in range(langid.LID_DIM)) + langid.LID_DIM
        for d in range(langid.LID_DIM):
            logp[(lg, d)] = _l2_int(counts[(lg, d)] + 1) - _l2_int(tot)
    ptot = sum(nprior.values()) + len(langid.LANGS)
    prior = {lg: _l2_int(nprior[lg] + 1) - _l2_int(ptot) for lg in langid.LANGS}
    return rows, counts, nprior, logp, prior


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    out = con.execute(sql).fetchall()
    con.close()
    return out


def test_train_oracle_matches_python_nb(fitted):
    rows, counts, nprior, logp, prior = fitted
    got = {(lg, d): (c, lp) for lg, d, c, lp in _duck(langid.LANGID_TRAIN_DUCK)}
    assert len(got) == len(langid.LANGS) * (langid.LID_DIM + 1)
    for lg in langid.LANGS:
        assert got[(lg, -1)] == (nprior[lg], prior[lg]), lg
        for d in range(langid.LID_DIM):
            assert got[(lg, d)] == (counts[(lg, d)], logp[(lg, d)]), (lg, d)


def test_eval_oracle_matches_python_predictions(fitted):
    rows, _, _, logp, prior = fitted
    exp: Counter = Counter()
    for _, teach, train, f in rows:
        if not f:
            continue
        s = {
            lg: prior[lg] + sum(c * logp[(lg, d)] for d, c in f.items())
            for lg in langid.LANGS
        }
        if s["en"] >= s["fr"] and s["en"] >= s["de"] and s["en"] >= s["es"]:
            pred = "en"
        elif s["de"] >= s["es"] and s["de"] >= s["fr"]:
            pred = "de"
        elif s["es"] >= s["fr"]:
            pred = "es"
        else:
            pred = "fr"
        exp[("train" if train else "val", teach, pred)] += 1
    got = {tuple(r[:3]): r[3] for r in _duck(langid.LANGID_EVAL_DUCK)}
    assert got == dict(exp)


def test_student_distills_the_teacher_well(fitted):
    """Held-out (val) agreement with the teacher must be high — the
    point of distillation — without being a hard-coded identity."""
    rows = _duck(langid.LANGID_EVAL_DUCK)
    val = [(t, s, n) for sp, t, s, n in rows if sp == "val"]
    agree = sum(n for t, s, n in val if t == s)
    tot = sum(n for _, _, n in val)
    assert tot >= 30
    assert agree / tot >= 0.9


def test_spark_side_matches_oracle_model(spark, sf_dir):
    got = {
        (r["lang"], r["dim"]): (r["cnt"], r["logp_q10"])
        for r in langid.QUERIES["docs_langid_train"](spark, sf_dir).collect()
    }
    exp = {(lg, d): (c, lp) for lg, d, c, lp in _duck(langid.LANGID_TRAIN_DUCK)}
    assert got == exp
