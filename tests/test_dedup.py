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
