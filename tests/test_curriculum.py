"""Curriculum schedule: independent Python replay, balanced phases,
and the monotone quality gradient (phase P-1 is the anneal slice)."""

from __future__ import annotations

import duckdb

from dataset_batch_processor_spark.operators import curriculum
from dataset_batch_processor_spark.operators.textanalysis import STOPWORDS

SF = "/root/testdata/sf0.001"


def test_schedule_matches_python_replay(spark):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM"
        f" read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()

    scored = []
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t]
        q = (
            sum(1 for t in toks if t in STOPWORDS) * 1_000_000 // len(toks)
            + len(set(toks)) * 1000 // len(toks)
        )
        scored.append((q, doc_id, len(toks)))
    scored.sort()
    n = len(scored)
    exp = {}
    for rnk, (q, doc_id, ntok) in enumerate(scored):
        p = rnk * curriculum.N_PHASES // n
        d = exp.setdefault(p, [0, 0, None, None, 0])
        d[0] += 1
        d[1] += ntok
        d[2] = q if d[2] is None else min(d[2], q)
        d[3] = q if d[3] is None else max(d[3], q)
        d[4] += q
    got = {
        r["phase"]: [
            r["n_docs"], r["n_tokens"], r["min_score"],
            r["max_score"], r["sum_score"],
        ]
        for r in curriculum._q_curriculum(spark, SF).collect()
    }
    assert got == {p: list(v) for p, v in exp.items()}
    # balanced phases, monotone quality gradient across boundaries
    counts = [got[p][0] for p in sorted(got)]
    assert max(counts) - min(counts) <= 1
    assert sorted(got) == list(range(curriculum.N_PHASES))
    for p in range(curriculum.N_PHASES - 1):
        assert got[p][3] <= got[p + 1][2]  # max(p) <= min(p+1)
    # the anneal slice really is higher quality than the start
    assert got[curriculum.N_PHASES - 1][2] > got[0][3]


def test_anneal_mixture_schedule_laws():
    """Endpoints equal the natural and quality shares exactly, every
    epoch's mixture conserves ~1e6 ppm, and the path is monotone per
    source (linear interpolation over non-negative integers)."""
    import duckdb

    from dataset_batch_processor_spark.operators import curriculum as cur

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    rows = con.execute(cur.ANNEAL_DUCK).fetchall()
    con.close()
    by_src: dict[str, dict[int, tuple]] = {}
    for epoch, source, w, nat, qual in rows:
        by_src.setdefault(source, {})[epoch] = (w, nat, qual)
    E = cur.N_EPOCHS
    for source, eps in by_src.items():
        assert set(eps) == set(range(E))
        w0, nat, qual = eps[0]
        assert w0 == nat
        assert eps[E - 1][0] == qual
        for e in range(E):
            assert eps[e][0] == ((E - 1 - e) * nat + e * qual) // (E - 1)
        ws = [eps[e][0] for e in range(E)]
        assert ws == sorted(ws) or ws == sorted(ws, reverse=True)
    # per-epoch conservation up to one truncation per source
    n_src = len(by_src)
    for e in range(E):
        tot = sum(eps[e][0] for eps in by_src.values())
        assert 1_000_000 - 2 * n_src <= tot <= 1_000_000
    # the anneal genuinely moves mass: endpoints differ somewhere
    assert any(eps[0][0] != eps[E - 1][0] for eps in by_src.values())
