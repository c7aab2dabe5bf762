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
