"""Round-15 optimization pins: the batch-vectorized lattice hash
kernels must be integer-identical to their per-image / SQL
references (the optimization changed plan shape, never values)."""

import numpy as np
import pytest

from dataset_batch_processor_spark.operators import imagedup, phash

IDS = [0, 1, 2, 3, 5, 104, 250, 251, 499, 500, 999, 1234, 4999, 12345]


def test_phash_batch_kernel_matches_per_image_kernel():
    b = phash._lattice_phash_batch(np.array(IDS, dtype=np.int64))
    for i, d in enumerate(IDS):
        expected = phash.phash_hash_array(imagedup.lattice_image(d))
        assert tuple(int(x) for x in b[i]) == expected, d


def test_dhash_batch_kernel_matches_duck_sql():
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT unnest(?::BIGINT[]) AS doc_id",
        [IDS],
    )
    sql = (
        f"WITH {imagedup._hash_sql('duck')} SELECT * FROM "
        f"({imagedup.HASHES_PIVOT}) ORDER BY doc_id"
    )
    expected = {r[0]: tuple(r[1:]) for r in con.execute(sql).fetchall()}
    b = imagedup._lattice_dhash_batch(np.array(IDS, dtype=np.int64))
    for i, d in enumerate(IDS):
        assert tuple(int(x) for x in b[i]) == expected[d], d


def test_dhash_pairs_df_matches_sql(spark, sf_dir):
    """Full pairs parity at sf0.001: DF-API kernel path == the SQL
    formulation it replaced, row for row."""
    from dataset_batch_processor_spark import catalog

    docs = catalog.load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    sql_rows = sorted(
        tuple(r) for r in spark.sql(imagedup.DHASH_PAIRS_SPARK).collect()
    )
    df_rows = sorted(
        tuple(r) for r in imagedup.dhash_pairs_df(docs).collect()
    )
    assert df_rows == sql_rows and len(df_rows) > 0


def test_cc_local_fast_path_matches_star_contraction(spark):
    """Round 15: the size-gated driver union-find must label exactly
    like the distributed star contraction it routes around."""
    from dataset_batch_processor_spark.operators import components as C

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (9, 9), (10, 11), (11, 3), (20, 21)],
        "src bigint, dst bigint",
    )
    local = sorted(
        tuple(r) for r in C.connected_components(edges).collect()
    )
    saved = C.SMALL_GRAPH_EDGE_CAP
    C.SMALL_GRAPH_EDGE_CAP = 0  # force the distributed path
    try:
        dist = sorted(
            tuple(r) for r in C.connected_components(edges).collect()
        )
    finally:
        C.SMALL_GRAPH_EDGE_CAP = saved
    assert local == dist
    comp = dict(local)
    assert comp[3] == 1 and comp[11] == 1 and comp[8] == 7 and comp[9] == 9


def _force_distributed(C, fn):
    saved = C.SMALL_GRAPH_EDGE_CAP
    C.SMALL_GRAPH_EDGE_CAP = -1  # force the distributed path
    try:
        return fn()
    finally:
        C.SMALL_GRAPH_EDGE_CAP = saved


def test_kcore_local_fast_path_matches_distributed_peel(spark):
    """Round 15b: the size-gated driver peel must emit exactly the
    distributed k-core's edge set (multi-round convergence case: the
    4-5-6 triangle survives only after the 1-2-3 chain peels away)."""
    from dataset_batch_processor_spark.operators import components as C

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (4, 6), (4, 5),
         (7, 8), (8, 9), (7, 9), (9, 10)],
        "doc_a bigint, doc_b bigint",
    ).distinct()
    local = sorted(tuple(r) for r in C.kcore(edges, k=2).collect())
    dist = _force_distributed(
        C, lambda: sorted(tuple(r) for r in C.kcore(edges, k=2).collect())
    )
    assert local == dist and len(local) > 0


def test_lpa_local_fast_path_matches_distributed(spark):
    """Round 15b: driver LPA (max-count, min-label vote) must label
    exactly like the distributed 4-round join/argmax chain — tie
    votes included (node 3 sees labels {1, 4} once each)."""
    from dataset_batch_processor_spark.operators import components as C

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (4, 6), (8, 9)],
        "doc_a bigint, doc_b bigint",
    )
    local = sorted(tuple(r) for r in C.label_propagation(edges).collect())
    dist = _force_distributed(
        C,
        lambda: sorted(
            tuple(r) for r in C.label_propagation(edges).collect()
        ),
    )
    assert local == dist and len(local) > 0


def test_pagerank_local_fast_path_matches_distributed(spark):
    """Round 15b: driver fixed-point pagerank must reproduce the
    distributed integer iteration bit for bit (DIV == // on the
    positive operands)."""
    from dataset_batch_processor_spark.operators import components as C

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (5, 6), (6, 7)],
        "doc_a bigint, doc_b bigint",
    )
    local = sorted(tuple(r) for r in C.pagerank_lite(edges).collect())
    dist = _force_distributed(
        C, lambda: sorted(tuple(r) for r in C.pagerank_lite(edges).collect())
    )
    assert local == dist and len(local) > 0


def test_winnow_arrow_kernel_matches_sql(spark, sf_dir):
    """Round 15: the Arrow Karp-Rabin winnowing kernel must emit the
    exact fingerprint set of the SQL window formulation."""
    from dataset_batch_processor_spark import catalog
    from dataset_batch_processor_spark.operators import textanalysis as ta

    docs = catalog.load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    sql_rows = sorted(
        (r[0], int(r[1])) for r in spark.sql(ta.WINNOW_SPARK).collect()
    )
    kr_rows = sorted(
        (r[0], int(r[1]))
        for r in ta.winnow_fingerprints_arrow(docs).collect()
    )
    assert kr_rows == sql_rows and len(kr_rows) > 0
