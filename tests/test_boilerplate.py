"""Boilerplate extraction: chrome dies, content survives, edge
pages behave (all-boilerplate, threshold-length blocks)."""

from __future__ import annotations

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import boilerplate


def test_fixture_page_keeps_content_drops_chrome(spark, sf_dir):
    out = boilerplate.QUERIES["docs_boilerplate_extract"](
        spark, sf_dir
    ).collect()
    assert len(out) == 500
    for r in out[:20]:
        assert r.n_blocks == 5
        assert r.n_good == 2  # the two content paragraphs
        assert r.max_link_ppm > boilerplate.MAX_LINK_PPM  # nav measured


def test_main_text_is_the_document_text(spark):
    docs = catalog.load_table(spark, "/root/testdata/sf0.001", "documents")
    from pyspark.sql import functions as F

    pages = docs.select("doc_id", "text", F.expr(boilerplate._PAGE).alias("html"))
    joined = boilerplate.extract_main_text(pages, "html").join(
        docs.select("doc_id", "text"), "doc_id"
    )
    for r in joined.limit(10).collect():
        main = r.main_text
        # chrome never leaks into the main text
        for chrome in ("Home", "click here", "Copyright", "Privacy"):
            assert chrome not in main
        # both halves of the original text survive (whitespace-joined;
        # the injected inline link text is the only addition)
        half = len(r.text) // 2
        assert r.text[:half].strip() in main
        assert r.text[half:].strip() in main.replace(
            " see details here", ""
        )


def test_all_boilerplate_page_yields_empty_main(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                '<div><a href="/">Home</a> <a href="/x">More</a></div>'
                "<p>tiny</p>",
            )
        ],
        "doc_id long, html string",
    )
    r = boilerplate.extract_main_text(df, "html").collect()[0]
    assert r.n_good == 0
    assert r.main_text == ""
    assert r.boiler_chars > 0


def test_min_words_threshold_is_inclusive(spark):
    ok = " ".join(["w%d" % i for i in range(boilerplate.MIN_WORDS)])
    short = " ".join(["w%d" % i for i in range(boilerplate.MIN_WORDS - 1)])
    df = spark.createDataFrame(
        [(1, f"<p>{ok}</p>"), (2, f"<p>{short}</p>")],
        "doc_id long, html string",
    )
    rows = {
        r.doc_id: r for r in boilerplate.extract_main_text(df, "html").collect()
    }
    assert rows[1].n_good == 1
    assert rows[2].n_good == 0


def test_block_order_preserved(spark):
    df = spark.createDataFrame(
        [
            (
                7,
                "<p>alpha one two three four five six seven</p>"
                "<p>beta one two three four five six seven</p>",
            )
        ],
        "doc_id long, html string",
    )
    r = boilerplate.extract_main_text(df, "html").collect()[0]
    assert r.main_text.index("alpha") < r.main_text.index("beta")


def test_optional_stopword_rule_fires_when_enabled(spark):
    stopless = " ".join(f"w{i}" for i in range(12))
    withstop = "the quick fox and the lazy dog ran off to the old barn"
    df = spark.createDataFrame(
        [(1, f"<p>{stopless}</p>"), (2, f"<p>{withstop}</p>")],
        "doc_id long, html string",
    )
    off = {r.doc_id: r.n_good
           for r in boilerplate.extract_main_text(df, "html").collect()}
    assert off == {1: 1, 2: 1}  # rule disabled: both pass
    on = {r.doc_id: r.n_good
          for r in boilerplate.extract_main_text(
              df, "html", min_stop_ppm=100_000).collect()}
    assert on == {1: 0, 2: 1}  # enabled: stopword-free block drops
    rows = {r.doc_id: r
            for r in boilerplate.extract_main_text(df, "html").collect()}
    assert rows[1].avg_stop_ppm == 0 and rows[2].avg_stop_ppm > 100_000
