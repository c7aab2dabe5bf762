"""Temperature mixture flattening property + blocklist rule edges."""

from __future__ import annotations

from dataset_batch_processor_spark.operators import corpusstats, webquality


def test_temperature_flattens_the_mixture(spark, sf_dir):
    rows = corpusstats.QUERIES["corpus_temperature_mixture"](
        spark, sf_dir
    ).collect()
    raw = [r.token_ppm for r in rows]
    tmp = [r.temp_ppm for r in rows]
    assert max(tmp) - min(tmp) < max(raw) - min(raw)
    # shares normalize (integer floor leaves < n_sources ppm slack)
    assert 1_000_000 - len(rows) <= sum(tmp) <= 1_000_000
    # low-resource boost: the smallest source gains, the largest loses
    lo = min(rows, key=lambda r: r.token_ppm)
    hi = max(rows, key=lambda r: r.token_ppm)
    assert lo.boost_x1000 > 1000 > hi.boost_x1000


def test_blocklist_counts_and_flags(spark):
    df = spark.createDataFrame(
        [
            (1, "clean text only safe words"),
            (2, "one slow word"),
            (3, "slow big hash slow"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in webquality.blocklist_filter(df).collect()}
    assert rows[1].n_hits == 0 and not rows[1].flagged
    assert rows[2].n_hits == 1 and rows[2].flagged
    assert rows[3].n_hits == 4 and rows[3].flagged
