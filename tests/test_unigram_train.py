"""Unigram-LM (SentencePiece) trainer: exact-integer log2 kernel,
independent end-to-end reimplementation parity, and qualitative
vocabulary-learning checks (VERDICT r8 next #2)."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np

from dataset_batch_processor_spark.operators import bpe


# ------------------------------------------- exact Q10 log2 kernel


def test_l2_int_matches_float_log2_within_quantization():
    rng = np.random.default_rng(9)
    xs = [1, 2, 3, 255, 256, 257, 65535, 2**40, 2**52]
    xs += [int(x) for x in rng.integers(1, 2**50, 200)]
    for x in xs:
        got = bpe._l2_int(x)
        want = 1024 * math.log2(x)
        # 8-bit mantissa -> max quantization error ~1024*log2(257/256)
        assert abs(got - want) <= 6, (x, got, want)


def test_l2_int_matches_duckdb_expression():
    """The oracle computes L2 via length(bin(x)) + the literal mantissa
    table; pin bit-exact agreement with the Python kernel."""
    import duckdb

    rng = np.random.default_rng(10)
    xs = [1, 2, 255, 256, 511, 512, 2**45] + [
        int(x) for x in rng.integers(1, 2**45, 100)
    ]
    con = duckdb.connect()
    frac = ",".join(
        f"({m},{v})" for m, v in zip(range(256, 512), bpe._L2_FRAC)
    )
    vals = ",".join(f"({x})" for x in xs)
    rows = con.execute(
        f"""
WITH l2frac(m, fv) AS (VALUES {frac}), xs(x) AS (VALUES {vals})
SELECT x, 1024 * (length(bin(x)) - 1) + f.fv
FROM xs JOIN l2frac f ON f.m = ((x * 256) >> (length(bin(x)) - 1))
"""
    ).fetchall()
    assert len(rows) == len(xs)
    for x, duck in rows:
        assert duck == bpe._l2_int(int(x)), x


# ------------------------- independent reimplementation (spec test)


def _independent_train(texts, seed_k, keep_k):
    """From-scratch single-process trainer following the documented
    spec (Counter-based, bin()-string log2) — shares NO code with the
    operator; disagreements flag a kernel bug on either side."""
    words = Counter(
        w for t in texts for w in re.findall("[a-z]+", t.lower())
    )
    subs: Counter = Counter()
    for w, f in words.items():
        for s in range(len(w)):
            for e in range(s + 1, min(s + bpe.UNI_TRAIN_MAXLEN, len(w)) + 1):
                subs[w[s:e]] += f

    def l2(x: int) -> int:
        msb = len(bin(x)[2:]) - 1
        m = (x * 256) // (2**msb)
        return 1024 * msb + round(1024 * math.log2(m / 256))

    def scores(counts):
        tot = sum(c + 1 for c in counts.values())
        return {p: l2(c + 1) - l2(tot) for p, c in counts.items()}

    def e_step(sc):
        mx = max(map(len, sc))
        out = dict.fromkeys(sc, 0)
        for w, f in words.items():
            best = [None] * (len(w) + 1)
            best[0] = (0, [])
            for i in range(1, len(w) + 1):
                cand = None
                for j in range(max(0, i - mx), i):
                    if best[j] is None or w[j:i] not in sc:
                        continue
                    t = best[j][0] + sc[w[j:i]]
                    if cand is None or t > cand[0]:
                        cand = (t, best[j][1] + [w[j:i]])
                best[i] = cand
            for p in best[len(w)][1]:
                out[p] += f
        return out

    chars = {p: c for p, c in subs.items() if len(p) == 1}
    multis = dict(
        sorted(
            ((p, c) for p, c in subs.items() if len(p) >= 2),
            key=lambda kv: (-kv[1], kv[0]),
        )[:seed_k]
    )
    c1 = e_step(scores({**chars, **multis}))
    km = sorted(
        (p for p in multis), key=lambda p: (-c1[p], p)
    )[:keep_k]
    kept = {p: c1[p] for p in list(chars) + km}
    c2 = e_step(scores(kept))
    s2 = scores(c2)
    return sorted((p, c2[p], s2[p]) for p in c2)


_TEXTS = [
    "the spark table joins the stream table",
    "spark spark table stream window",
    "a window over the stream orders the table",
    "join order join order spark",
    "tables of sparks stream by the window",
]


def test_trainer_matches_independent_reimplementation(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id long, text string"
    )
    got = bpe.unigram_train(docs, seed_k=12, keep_k=6)
    want = _independent_train(_TEXTS, seed_k=12, keep_k=6)
    assert got == want


def test_trainer_learns_repeated_word_pieces(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id long, text string"
    )
    vocab = bpe.unigram_train(docs, seed_k=12, keep_k=6)
    pieces = {p for p, _c, _s in vocab}
    multis = {p for p in pieces if len(p) >= 2}
    # every corpus character survives (coverage guarantee)
    corpus_chars = {c for t in _TEXTS for c in t if c.isalpha()}
    assert corpus_chars <= pieces
    assert len(multis) == 6
    # the dominant words' 4-gram stems are what the count prune keeps
    assert multis & {"spar", "park", "tabl", "able", "trea", "stre"}
    for _p, c, s in vocab:
        assert s < 0  # add-one Q10 log-probs are strictly negative
        assert c >= 0
