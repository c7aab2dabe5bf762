"""MMR diversified top-k: Spark output equals an INDEPENDENT plain-
Python greedy replay (own cosine, own quantization, own tie rules),
and the selection genuinely diversifies (penalties bind)."""

from __future__ import annotations

import math

import duckdb
import pytest

from dataset_batch_processor_spark.operators import mmr

SF = "/root/testdata/sf0.001"


def _q6(x: float) -> int:
    return math.floor(round(x, 6) * 1_000_000 + 0.5)


def _cos(a, b) -> float:
    dot = sum(float(x) * float(y) for x, y in zip(a, b))
    na = math.sqrt(sum(float(x) * float(x) for x in a))
    nb = math.sqrt(sum(float(y) * float(y) for y in b))
    return dot / (na * nb)


@pytest.fixture(scope="module")
def embs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM"
        f" read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    con.close()
    return {vid: emb for vid, emb in rows}


def _python_mmr(embs, k=mmr.MMR_K, cand_n=mmr.CAND_N):
    from dataset_batch_processor_spark.operators.similarity import QUERY_MOD

    out = []
    queries = [v for v in embs if v % QUERY_MOD == 0]
    for q in queries:
        rel = {
            n: _q6(_cos(embs[q], embs[n])) for n in embs if n != q
        }
        cand = sorted(rel, key=lambda n: (-rel[n], n))[:cand_n]
        sel = [min(cand, key=lambda n: (-rel[n], n))]
        out.append((q, 1, sel[0], rel[sel[0]], 0))
        for t in range(2, k + 1):
            best, key = None, None
            for n in cand:
                if n in sel:
                    continue
                pen = max(
                    _q6(_cos(embs[n], embs[s])) for s in sel
                )
                kk = (-(rel[n] - pen), n)
                if key is None or kk < key:
                    best, key, bpen = n, kk, pen
            sel.append(best)
            out.append((q, t, best, rel[best], bpen))
    return sorted(out)


def test_mmr_matches_independent_python(spark, embs):
    got = sorted(
        (r["query_id"], r["mmr_rank"], r["neighbor_id"], r["rel_q6"],
         r["penalty_q6"])
        for r in mmr.QUERIES["emb_mmr_topk"](spark, SF).collect()
    )
    assert got == _python_mmr(embs)


def test_mmr_diversifies(spark):
    rows = mmr.QUERIES["emb_mmr_topk"](spark, SF).collect()
    # rank 1 is the pure-relevance argmax with zero penalty
    for r in rows:
        if r["mmr_rank"] == 1:
            assert r["penalty_q6"] == 0
            assert r["mmr_q6"] == r["rel_q6"]
        else:
            assert r["mmr_q6"] == r["rel_q6"] - r["penalty_q6"]
    # penalties bind somewhere: the re-rank is not a no-op
    assert any(r["penalty_q6"] > 0 for r in rows if r["mmr_rank"] > 1)
    # the MMR order deviates from pure relevance order for >= 1 query
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    deviates = 0
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["mmr_rank"])
        rel_order = sorted(rs, key=lambda r: (-r["rel_q6"],
                                              r["neighbor_id"]))
        if [r["neighbor_id"] for r in rs] != [
            r["neighbor_id"] for r in rel_order
        ]:
            deviates += 1
    assert deviates > 0
