"""LM-objective transforms: the DuckDB oracle (which the driver
hash-compares against the Spark plan) is itself pinned here against
an independent Python reimplementation of T5 span corruption and
FIM, so both engines' agreement can't be a shared misreading."""

from __future__ import annotations

import hashlib

import duckdb

from dataset_batch_processor_spark.operators import lmobjectives as lmo


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def _ref_span(doc_id: int, text: str):
    toks = text.split(" ")
    mask = [
        _h(f"{doc_id}:{p}") % lmo.MASK_DEN < lmo.MASK_NUM
        for p in range(len(toks))
    ]
    inputs, targets = [], []
    k = -1
    for p, (t, m) in enumerate(zip(toks, mask)):
        start = m and (p == 0 or not mask[p - 1])
        if start:
            k += 1
            inputs.append(f"<extra_id_{k}>")
            targets.append(f"<extra_id_{k}>")
            targets.append(t)
        elif m:
            targets.append(t)
        else:
            inputs.append(t)
    return (
        len(toks),
        sum(mask),
        k + 1,
        hashlib.md5(" ".join(inputs).encode()).hexdigest(),
        hashlib.md5(" ".join(targets).encode()).hexdigest(),
    )


def _ref_fim(doc_id: int, text: str):
    c1 = _h(f"{doc_id}:a") % (len(text) + 1)
    c2 = c1 + _h(f"{doc_id}:b") % (len(text) - c1 + 1)
    s = (
        "<PRE> " + text[:c1] + " <SUF> " + text[c2:]
        + " <MID> " + text[c1:c2]
    )
    return c1, c2, len(text), hashlib.md5(s.encode()).hexdigest()


def _view(con, texts):
    con.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") AS t(doc_id, text)"
    )


TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "one",
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
]


def test_span_corruption_oracle_matches_reference():
    con = duckdb.connect()
    _view(con, TEXTS)
    rows = {
        r[0]: r[1:]
        for r in con.execute(lmo.SPAN_CORRUPTION_DUCK).fetchall()
    }
    for i, t in enumerate(TEXTS):
        assert rows[i] == _ref_span(i, t), (i, rows[i], _ref_span(i, t))


def test_fim_oracle_matches_reference():
    con = duckdb.connect()
    _view(con, TEXTS)
    rows = {r[0]: r[1:] for r in con.execute(lmo.FIM_DUCK).fetchall()}
    for i, t in enumerate(TEXTS):
        assert rows[i] == _ref_fim(i, t)


def test_span_mask_rate_near_fifteen_percent():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.01/documents.parquet'"
    )
    tot, masked = con.execute(
        f"SELECT sum(n_tokens), sum(n_masked) FROM "
        f"({lmo.SPAN_CORRUPTION_DUCK})"
    ).fetchone()
    rate = masked / tot
    assert 0.12 < rate < 0.18, rate


# ------------------------------------------------------- UL2 mixture


def _ref_ul2(doc_id: int, text: str):
    toks = text.split(" ")
    n = len(toks)
    mode_h = _h(f"{doc_id}:ul2m") % 4
    mode = {2: "S", 3: "X"}.get(mode_h, "R")
    cut = n // 4 + _h(f"{doc_id}:ul2c") % (n // 2 + 1)
    if mode == "S":
        mask = [p >= cut for p in range(n)]
    else:
        num = lmo.X_NUM if mode == "X" else lmo.MASK_NUM
        mask = [
            _h(f"{doc_id}:{p}") % lmo.MASK_DEN < num for p in range(n)
        ]
    inputs, targets = [], []
    k = -1
    for p, (t, m) in enumerate(zip(toks, mask)):
        start = m and (p == 0 or not mask[p - 1])
        if start:
            k += 1
            inputs.append(f"<extra_id_{k}>")
            targets.append(f"<extra_id_{k}>")
            targets.append(t)
        elif m:
            targets.append(t)
        else:
            inputs.append(t)
    return (
        mode,
        n,
        sum(mask),
        k + 1,
        hashlib.md5((f"[{mode}] " + " ".join(inputs)).encode()).hexdigest(),
        hashlib.md5(" ".join(targets).encode()).hexdigest(),
    )


def test_ul2_oracle_matches_reference():
    con = duckdb.connect()
    _view(con, TEXTS)
    rows = {r[0]: r[1:] for r in con.execute(lmo.UL2_DOC_DUCK).fetchall()}
    for i, t in enumerate(TEXTS):
        assert rows[i] == _ref_ul2(i, t), (i, rows[i], _ref_ul2(i, t))


def test_ul2_mixture_semantics():
    """Paradigm semantics at corpus scale: S is a SINGLE tail span at
    ~50% mass in the middle-half window, X masks ~50% in many spans,
    R matches the T5 rate; every doc appears in exactly one mode."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.01/documents.parquet'"
    )
    docs = con.execute(lmo.UL2_DOC_DUCK).fetchall()
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert len(docs) == n_docs
    card = {r[0]: r[1:] for r in con.execute(lmo.UL2_CARD_DUCK).fetchall()}
    assert set(card) == {"R", "S", "X"}
    assert sum(c[0] for c in card.values()) == n_docs
    # S: exactly one span per doc; cut lands in [n/4, 3n/4]
    assert card["S"][3] == 1000
    assert 250_000 <= card["S"][2] <= 760_000
    # X: ~50% mask, multiple spans
    assert 400_000 <= card["X"][2] <= 600_000
    assert card["X"][3] > 1000
    # R: the T5 rate
    assert 100_000 <= card["R"][2] <= 200_000
    # card reconciles with the per-doc rows exactly
    for mode in ("R", "S", "X"):
        sub = [d for d in docs if d[1] == mode]
        assert card[mode][0] == len(sub)
        assert card[mode][1] == sum(d[2] for d in sub)
        assert card[mode][2] == (
            sum(d[3] for d in sub) * 1_000_000 // sum(d[2] for d in sub)
        )


def test_ul2_on_adversarial_texts():
    """Differential fuzz for the UL2 chain on degenerate docs: single
    token (cut can be 0 -> whole doc is the S target), two tokens,
    all-identical tokens, and a long doc — oracle == Python replay."""
    texts = [
        "solo",
        "a b",
        "x x x x x x x x",
        " ".join(f"w{i % 7}" for i in range(120)),
    ]
    con = duckdb.connect()
    _view(con, texts)
    rows = {r[0]: r[1:] for r in con.execute(lmo.UL2_DOC_DUCK).fetchall()}
    con.close()
    for i, t in enumerate(texts):
        assert rows[i] == _ref_ul2(i, t), (i, t, rows[i], _ref_ul2(i, t))
