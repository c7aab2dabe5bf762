"""DoReMi domain-mixture reweighting: MWU dynamics, exact-integer
trajectory parity, and the distributed loss pass."""

from __future__ import annotations

from dataset_batch_processor_spark.operators import doremi


def test_mwu_hard_domains_gain_weight():
    # three domains: hard (high OOV), average, easy
    stats = [("easy", 100, 100_000), ("avg", 100, 300_000),
             ("hard", 100, 500_000)]
    rows = dict(
        (s, w) for s, _n, _lp, _e, w in doremi.mwu_trajectory(stats)
    )
    assert rows["hard"] > rows["avg"] > rows["easy"]
    # smoothing keeps every domain above the uniform floor's share
    uniform = doremi.Q6 // 3
    floor = doremi.SMOOTH_Q * uniform // doremi.Q6
    assert all(w >= floor for w in rows.values())
    # weights stay a near-normalized ppm simplex (trunc-div slack only)
    assert abs(sum(rows.values()) - doremi.Q6) < 3 * 3 + doremi.Q6 // 100


def test_mwu_uniform_losses_stay_uniform():
    stats = [(f"d{i}", 10, 250_000) for i in range(4)]
    rows = doremi.mwu_trajectory(stats)
    weights = {w for _s, _n, _lp, _e, w in rows}
    assert len(weights) == 1  # zero excess everywhere -> symmetric


def test_excess_is_doc_weighted():
    # overall mean must weight by n_docs: a tiny hard domain cannot
    # drag the baseline the way a huge one does
    stats = [("big_easy", 900, 100_000), ("small_hard", 100, 900_000)]
    rows = {s: e for s, _n, _lp, e, _w in doremi.mwu_trajectory(stats)}
    overall = (900 * 100_000 + 100 * 900_000) // 1000
    assert rows["big_easy"] == 100_000 - overall
    assert rows["small_hard"] == 900_000 - overall


def test_domain_losses_distributed(spark):
    docs = spark.createDataFrame(
        [
            (0, "the the the", "en", "common", 11),
            (1, "the the zzz", "en", "common", 11),
            (2, "qqq zzz qqq xyzzy", "en", "rare", 17),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {
        r["source"]: (int(r["n_docs"]), int(r["loss_ppm"]))
        for r in doremi.domain_losses(docs, vocab_k=1).collect()
    }
    # vocab = {'the'}; doc0 oov 0/3, doc1 oov 1/3, doc2 oov 4/4
    assert rows["common"] == (2, (0 + 1_000_000 // 3) // 2)
    assert rows["rare"] == (1, 1_000_000)
