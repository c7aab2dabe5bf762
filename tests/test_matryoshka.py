"""Matryoshka truncation report: the full-dim tier must be the
identity (overlap 1.0 by construction — it IS the gated brute-force
ranking), tiers are monotone non-decreasing in D on this fixture, and
the Spark side equals the oracle row for row."""

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
    ppms = [by_d[d][4] for d in sorted(matryoshka.MRL_TIERS)]
    assert all(a <= b for a, b in zip(ppms, ppms[1:]))


def test_spark_matches_oracle(spark, sf_dir):
    got = sorted(
        tuple(r)
        for r in matryoshka._q_matryoshka_recall(spark, sf_dir).collect()
    )
    assert got == _duck()
