"""In-context packing order: independent numpy replay of the
assignment + adjacency gain, invariants, and the plan pin."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from dataset_batch_processor_spark.operators import icp, similarity

SF = "/root/testdata/sf0.001"


def _load():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM"
        f" read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = [r[0] for r in rows]
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, mat


def _cos6(a, b):
    c = float(np.dot(a, b) / (math.sqrt(np.dot(a, a)) *
                              math.sqrt(np.dot(b, b))))
    return round(c, 6)


def test_gain_matches_numpy_replay(spark):
    ids, mat = _load()
    emb = {i: mat[k] for k, i in enumerate(ids)}
    cents = [i for i in ids if i % similarity.CENTROID_MOD == 0]
    # nearest centroid, rounded-cosine with centroid-id tiebreak —
    # the IVF gate's assignment definition
    assign = {}
    for i in ids:
        best = max(
            cents, key=lambda c: (_cos6(emb[i], emb[c]), -c)
        )
        assign[i] = best

    def stats(order):
        qs = [
            int(math.floor(_cos6(emb[a], emb[b]) * 1_000_000 + 0.5))
            for a, b in zip(order, order[1:])
        ]
        s = sum(qs)
        n = len(qs)
        avg = -((-s) // n) if s < 0 else s // n  # trunc toward zero
        return (n, s, avg)

    sem_order = sorted(ids, key=lambda i: (assign[i], i))
    exp = {
        "semantic": stats(sem_order),
        "baseline": stats(sorted(ids)),
    }
    got = {
        r["ordering"]: (r["n_pairs"], r["sum_cos6"], r["avg_cos6"])
        for r in icp._q_semantic_pack_order(spark, SF).collect()
    }
    assert got == exp
    # the committed gain is real on the fixture: clustered adjacency
    # beats arrival order by a wide margin
    assert got["semantic"][2] > got["baseline"][2] + 50_000
    assert got["semantic"][0] == len(ids) - 1


def test_plan_no_corpus_window(spark):
    import re

    from dataset_batch_processor_spark.plans import explain

    plan = explain.formatted_plan(
        icp._q_semantic_pack_order(spark, SF)
    )
    bad = [
        m.group(1)
        for m in re.finditer(r"windowspecdefinition\(([^,)]*)", plan)
        if re.search(r"\s(ASC|DESC)\b", m.group(1))
        and not m.group(1).startswith("_pid")
    ]
    assert bad == [], plan
    assert "CartesianProduct" not in plan, plan


def test_icp_pack_conserves_and_differs(spark):
    """The semantic-order packer is the SAME packer under a different
    total order: totals conserve exactly (tokens, sequences, mask,
    docs started), but the composition genuinely changes."""
    from dataset_batch_processor_spark.operators import chat

    sem = icp._q_icp_pack_sequences(spark, SF).collect()
    base = chat.QUERIES["docs_chat_pack_sequences"](spark, SF).collect()

    def totals(rows):
        return (
            len(rows),
            sum(r["tokens_used"] for r in rows),
            sum(r["mask_tokens"] for r in rows),
            sum(r["n_docs_started"] for r in rows),
        )

    assert totals(sem) == totals(base)
    # a different order: at least one sequence leads with a
    # different doc
    sem_first = {r["seq_id"]: r["first_doc"] for r in sem}
    base_first = {r["seq_id"]: r["first_doc"] for r in base}
    assert sem_first != base_first


def test_icp_pack_misaligned_corpus_parity(spark):
    """sf0.1 has 5000 docs but only 500 embeddings — the remainder
    path (unembedded docs as one trailing arrival-order block) must
    agree across engines and conserve totals there too."""
    import duckdb

    sf = "/root/testdata/sf0.1"
    got = sorted(
        tuple(r)
        for r in icp._q_icp_pack_sequences(spark, sf).collect()
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf}/{t}.parquet')"
        )
    exp = sorted(tuple(r) for r in con.execute(
        icp.ORACLES["docs_icp_pack_sequences"]
    ).fetchall())
    con.close()
    assert got == exp
    # conservation vs the arrival-order packer holds at the
    # misaligned scale by construction (left join drops nothing)
    from dataset_batch_processor_spark.operators import chat

    base = chat.QUERIES["docs_chat_pack_sequences"](spark, sf).collect()
    assert sum(r[4] for r in got) == sum(
        r["tokens_used"] for r in base
    )
