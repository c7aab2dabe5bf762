"""Dedup tuning: the sweep->chooser pure logic (the query-side
execution and the sweep numbers are driver-oracled)."""
def test_choose_banding_policy():
    from dataset_batch_processor_spark.operators.dedup import choose_banding

    rows = [
        {"n_bands": 8, "band_rows": 1, "n_detected": 25, "n_candidates": 8217},
        {"n_bands": 4, "band_rows": 2, "n_detected": 25, "n_candidates": 103},
        {"n_bands": 2, "band_rows": 4, "n_detected": 25, "n_candidates": 25},
        {"n_bands": 1, "band_rows": 8, "n_detected": 24, "n_candidates": 24},
    ]
    # max detection first (the 24-detected config loses even though it
    # is cheapest), then fewest candidates among the tied
    assert choose_banding(rows) == (2, 4)
    # detection dominates cost
    rows[3]["n_detected"] = 26
    assert choose_banding(rows) == (1, 8)


def test_hot_bucket_cap_default_on_and_escape_hatch(spark):
    """Round 9 (VERDICT r8 next #5): the banded candidate join caps
    degenerate buckets BY DEFAULT. A clone-heavy corpus puts all
    clones in one bucket per band; a cap below the clone count drops
    those buckets entirely, the default cap (sized above fixture
    buckets) and the explicit None escape hatch keep them."""
    from dataset_batch_processor_spark.operators import dedup

    clones = [(i, "the same boilerplate line repeated " * 3) for i in range(12)]
    distinct = [(100 + i, f"unique document text number {i} " * 3)
                for i in range(3)]
    docs = spark.createDataFrame(
        clones + distinct, "doc_id long, text string"
    )
    full = {(r.doc_a, r.doc_b)
            for r in dedup.lsh_pairs_df(docs, max_bucket_size=None).collect()}
    assert len(full) >= 66  # C(12,2) clone pairs survive uncapped
    capped = {(r.doc_a, r.doc_b)
              for r in dedup.lsh_pairs_df(docs, max_bucket_size=8).collect()}
    clone_pairs = {(a, b) for a, b in capped if a < 12 and b < 12}
    assert not clone_pairs  # the mega-bucket was dropped in every band
    default = {(r.doc_a, r.doc_b) for r in dedup.lsh_pairs_df(docs).collect()}
    assert default == full  # default cap is above this bucket size
