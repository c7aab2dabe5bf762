"""Round-14 new families: DuckDB oracles pinned against independent
plain-Python replays (vocab overlap, n-gram novelty, annotator
kappa, sliding-window chunks)."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb
import pytest

from dataset_batch_processor_spark.operators import (
    agreement,
    corpusstats,
    ragchunk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return c


@pytest.fixture(scope="module")
def docs(con):
    return con.execute(
        "SELECT doc_id, text, source FROM documents ORDER BY doc_id"
    ).fetchall()


def test_vocab_overlap_replay(con, docs):
    per_src: dict = {}
    for _d, text, src in docs:
        cnt = per_src.setdefault(src, Counter())
        for t in text.split(" "):
            if t:
                cnt[t] += 1
    topk = {
        s: set(
            t
            for t, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[
                : corpusstats.VOCAB_OVERLAP_K
            ]
        )
        for s, c in per_src.items()
    }
    expect = {}
    srcs = sorted(topk)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = len(topk[a] & topk[b])
            if inter == 0:
                continue  # the join emits only colliding pairs
            union = len(topk[a]) + len(topk[b]) - inter
            expect[(a, b)] = (inter, inter * 1_000_000 // union)
    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            corpusstats._vocab_overlap_sql("duck")
        ).fetchall()
    }
    assert got == expect
    assert expect, "fixture must produce at least one overlapping pair"


def test_ngram_novelty_replay(con, docs):
    freq: Counter = Counter()
    per_doc: dict = {}
    for d, text, _s in docs:
        w = text.split(" ")
        grams = [
            f"{w[i]} {w[i + 1]} {w[i + 2]}" for i in range(len(w) - 2)
        ]
        if grams:
            per_doc[d] = grams
            freq.update(grams)
    expect = {}
    for d, grams in per_doc.items():
        novel = sum(1 for g in grams if freq[g] == 1)
        expect[d] = (len(grams), novel, novel * 1_000_000 // len(grams))
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(corpusstats._novelty_sql("duck")).fetchall()
    }
    assert got == expect
    assert any(v[1] > 0 for v in expect.values())


def _h28(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def test_annotator_kappa_replay(con, docs):
    n = n11 = n10 = n01 = n00 = 0
    for d, _t, _s in docs:
        a = 1 if _h28(f"{d}:aga") % 100 < 60 else 0
        flip = 1 if _h28(f"{d}:agb") % 100 < 20 else 0
        b = 1 - a if flip else a
        n += 1
        n11 += a and b
        n10 += a and not b
        n01 += (not a) and b
        n00 += (not a) and (not b)
    agree = n11 + n00
    pesum = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    num, den = n * agree - pesum, n * n - pesum
    expect = (
        n, n11, n10, n01, n00, agree,
        agree * 1_000_000 // n,
        pesum * 1_000_000 // (n * n),
        0 if num <= 0 else num * 1_000_000 // den,
    )
    row = con.execute(agreement._kappa_sql("duck")).fetchone()
    assert tuple(row) == expect
    assert expect[-1] > 400_000, "construction should give strong kappa"


def test_window_chunks_replay(con, docs):
    W, S = ragchunk.CHUNK_W, ragchunk.CHUNK_S
    expect = []
    for d, text, _s in docs:
        if not text:
            continue
        w = text.split(" ")
        ntok = len(w)
        kmax = max(-(-(ntok - W) // S), 0)  # ceil for ints, floor 0
        for k in range(kmax + 1):
            start = 1 + k * S
            if start > ntok:
                continue
            window = w[start - 1: start - 1 + W]
            expect.append(
                (
                    d, k, start, len(window),
                    hashlib.md5(" ".join(window).encode()).hexdigest(),
                )
            )
    expect.sort()
    got = sorted(
        tuple(r) for r in con.execute(ragchunk._chunks_sql("duck")).fetchall()
    )
    assert got == expect
    # overlap property: consecutive chunks share W - S tokens
    assert any(r[1] > 0 for r in expect), "fixture must have long docs"


def test_chunk_dedup_replay(con, docs):
    from collections import Counter

    W, S = ragchunk.CHUNK_W, ragchunk.CHUNK_S
    per_doc: dict = {}
    freq: Counter = Counter()
    for d, text, _s in docs:
        if not text:
            continue
        w = text.split(" ")
        ntok = len(w)
        kmax = max(-(-(ntok - W) // S), 0)
        addrs = []
        for k in range(kmax + 1):
            start = 1 + k * S
            if start > ntok:
                continue
            addrs.append(
                hashlib.md5(
                    " ".join(w[start - 1: start - 1 + W]).encode()
                ).hexdigest()
            )
        per_doc[d] = addrs
        freq.update(addrs)
    expect = {}
    for d, addrs in per_doc.items():
        dup = sum(1 for a in addrs if freq[a] > 1)
        expect[d] = (len(addrs), dup, dup * 1_000_000 // len(addrs))
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(ragchunk._chunk_dedup_sql("duck")).fetchall()
    }
    assert got == expect


def test_ann_lsh_recall_is_consistent(con):
    """recall rows must be exactly |exact top-k sets ∩ lsh top-k
    sets| per query — replayed from the two gated oracles."""
    from dataset_batch_processor_spark.operators import embed

    exact = con.execute(embed.EMBED_ANN_DUCK).fetchall()
    lsh = con.execute(embed.EMBED_LSH_DUCK).fetchall()
    ex: dict = {}
    for q, n, *_ in exact:
        ex.setdefault(q, set()).add(n)
    ls: dict = {}
    for q, n, *_ in lsh:
        ls.setdefault(q, set()).add(n)
    expect = {
        q: (
            len(ns),
            len(ns & ls.get(q, set())),
            len(ns & ls.get(q, set())) * 1_000_000 // len(ns),
        )
        for q, ns in ex.items()
    }
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(embed.ANN_LSH_RECALL_DUCK).fetchall()
    }
    assert got == expect


def test_quality_length_spearman_replay(con):
    """Independent Python Spearman over the quality oracle's own
    rows, with the identical (value, doc_id) tie-broken ranks and
    truncate-toward-zero ppm."""
    from dataset_batch_processor_spark.operators import textanalysis

    rows = con.execute(
        f"SELECT doc_id, n_chars, quality_score "
        f"FROM ({textanalysis.QUALITY_DUCK})"
    ).fetchall()
    rq = {
        d: i + 1
        for i, (d, _c, _q) in enumerate(
            sorted(rows, key=lambda r: (r[2], r[0]))
        )
    }
    rl = {
        d: i + 1
        for i, (d, _c, _q) in enumerate(
            sorted(rows, key=lambda r: (r[1], r[0]))
        )
    }
    n = len(rows)
    d2 = sum((rq[d] - rl[d]) ** 2 for d, _c, _q in rows)
    den = n * (n * n - 1)
    num = den - 6 * d2
    # truncate-toward-zero ppm (matches the sign-handled _scaled_div)
    rho_ppm = (abs(num) * 1_000_000 // den) * (1 if num >= 0 else -1)
    got = con.execute(textanalysis.SPEARMAN_DUCK).fetchone()
    assert tuple(got) == (n, d2, rho_ppm)
    # the diagnostic DOES fire on the fixture: type-token ratio falls
    # with document length (longer word-soup docs repeat vocabulary),
    # so the heuristic quality score is a strong INVERSE length proxy
    # here — exactly the kind of hidden coupling the query exists to
    # expose (sf0.001 rho ~ -0.96)
    assert rho_ppm < -500_000
