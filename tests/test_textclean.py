"""Text cleaning: unit semantics + JVM-only plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataset_batch_processor_spark.operators import textclean


def _one(spark, raw):
    df = spark.createDataFrame([(raw,)], "raw string")
    return df.select(textclean.clean_text(F.col("raw")).alias("c")).collect()[0].c


def test_clean_text_end_to_end(spark):
    raw = ('<div id="a">Hello &amp; welcome</div>\n\n Contact '
           "bob@example.com or https://x.org/y?z=1 ref 123456789 now")
    assert _one(spark, raw) == (
        "Hello & welcome Contact <EMAIL> or <URL> ref <NUM> now"
    )


def test_entities_inside_tags_die_with_the_tag(spark):
    assert _one(spark, '<a href="https://x.com/&amp;">t</a>') == "t"


def test_short_digit_runs_survive(spark):
    assert _one(spark, "born 1984, id 98765") == "born 1984, id <NUM>"


def test_double_escaped_entities(spark):
    # &amp;lt; unescapes to &lt; exactly once (amp replaced last)
    assert _one(spark, "a &amp;lt; b") == "a &lt; b"


def test_clean_query_stays_in_codegen(spark, sf_dir):
    """The scrub chain must be pure JVM expressions — no BatchEvalPython
    / ArrowEvalPython stage anywhere in the plan."""
    plan = textclean._q_clean_pii(spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "EvalPython" not in plan
    assert "*(" in plan  # whole-stage-codegen stage markers


# ------------------------------------- within-document paragraph dedup


def _dedup_one(spark, raw: str) -> str:
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(raw,)], "raw string")
    return df.select(
        textclean.dedup_paragraphs(F.col("raw")).alias("c")
    ).collect()[0].c


def test_intradoc_repeat_dropped_first_kept(spark):
    assert _dedup_one(spark, "aa\nbb\naa\ncc\nbb") == "aa\nbb\ncc"


def test_intradoc_unique_text_unchanged(spark):
    assert _dedup_one(spark, "one\ntwo\nthree") == "one\ntwo\nthree"


def test_intradoc_query_drops_the_planted_repeat(spark, sf_dir):
    out = textclean.QUERIES["docs_intradoc_dedup"](spark, sf_dir)
    rows = out.collect()
    assert all(r.n_paras == 3 for r in rows)
    assert all(r.n_kept == 2 for r in rows)
    assert all(r.removed_chars > 0 for r in rows)


def test_intradoc_dedup_stays_in_codegen(spark, sf_dir):
    plan = textclean._q_intradoc_dedup(spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "EvalPython" not in plan


# ------------------------------------------ cross-document line dedup


def test_crossdoc_drops_boilerplate_and_footers(spark, sf_dir):
    out = textclean.QUERIES["docs_crossdoc_line_dedup"](spark, sf_dir)
    rows = out.collect()
    assert len(rows) == 500
    # the corpus-wide boilerplate line and the per-source footer
    # (count 25 >= T) are dropped from EVERY document
    assert all(r.n_kept <= r.n_paras - 2 for r in rows)
    assert all(r.removed_chars > 0 for r in rows)
    # but body chunks survive: no document is emptied
    assert all(r.n_kept > 0 for r in rows)


def test_crossdoc_wrapper_shape(spark):
    # the deterministic wrapper puts the boilerplate first, the
    # per-source footer last, and 4-word body chunks between
    docs = spark.createDataFrame(
        [(i, "one two three four five six", "en", "s%d" % (i % 2), 0)
         for i in range(6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.createOrReplaceTempView("documents")
    raw = spark.sql(
        "SELECT " + textclean._CROSS_RAW_SPARK + " AS raw FROM documents"
    ).collect()
    for r in raw:
        paras = r.raw.split("\n")
        assert paras[0] == textclean._BOILER
        assert paras[1] == "one two three four"
        assert paras[2] == "five six"
        assert paras[-1].startswith("footer s")
