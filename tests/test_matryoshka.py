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


def test_degenerate_empty_corpus_parity(spark, tmp_path):
    """ADVICE r10 + round-11 review finding #1: on an EMPTY embeddings
    table both engines must emit the identical one-row-per-tier
    (dim, 0, k, 0, 0) shape — Spark's NULL-sum and DuckDB's //-raise
    hazards are both guarded."""
    import duckdb

    from dataset_batch_processor_spark import catalog
    from dataset_batch_processor_spark.operators import matryoshka

    sf = str(tmp_path)
    empty = catalog.load_table(
        spark, "/root/testdata/sf0.001", "embeddings"
    ).limit(0)
    empty.write.parquet(f"{sf}/embeddings.parquet")

    got = sorted(
        tuple(r)
        for r in matryoshka.QUERIES["emb_matryoshka_recall"](
            spark, sf
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM"
        f" read_parquet('{sf}/embeddings.parquet/*.parquet')"
    )
    exp = sorted(
        tuple(r)
        for r in con.execute(
            matryoshka.ORACLES["emb_matryoshka_recall"]
        ).fetchall()
    )
    con.close()
    assert got == exp
    assert got == sorted(
        (d, 0, 5, 0, 0) for d in matryoshka.MRL_TIERS
    )
