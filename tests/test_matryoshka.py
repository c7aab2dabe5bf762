"""Matryoshka truncation report: the full-dim tier must be the
identity (overlap 1.0 by construction — it IS the gated brute-force
ranking) and must strictly dominate every truncated tier. NOTE: the
fixture embeddings are random, not MRL-trained, so tier-to-tier
monotonicity is NOT guaranteed (and indeed 8 beats 16 at sf0.001 by
sampling noise) — the report faithfully measuring that is the point;
an MRL-trained encoder is what makes the curve monotone."""

from __future__ import annotations

import duckdb

from dataset_batch_processor_spark.operators import matryoshka

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM"
        f" read_parquet('{SF}/embeddings.parquet')"
    )
    out = sorted(con.execute(matryoshka._matryoshka_duck()).fetchall())
    con.close()
    return out


def test_full_dim_tier_is_identity_and_monotone():
    rows = _duck()
    assert [r[0] for r in rows] == sorted(matryoshka.MRL_TIERS)
    by_d = {r[0]: r for r in rows}
    full = by_d[matryoshka.DIM]
    assert full[4] == 1_000_000  # overlap_ppm == 1.0 exactly
    assert full[3] == full[1] * full[2]  # every (query, k) pair overlaps
    for d in matryoshka.MRL_TIERS:
        if d != matryoshka.DIM:
            assert by_d[d][4] < 1_000_000, d


def test_spark_matches_oracle(spark, sf_dir):
    got = sorted(
        tuple(r)
        for r in matryoshka._q_matryoshka_recall(spark, sf_dir).collect()
    )
    assert got == _duck()
