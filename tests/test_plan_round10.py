"""Plan-shape pins for the round-10 families — the 100 TB posture
guards (test_plan_shape.py convention): no cartesian products, no
unpartitioned data windows, Python kernels stay in Arrow form."""

from __future__ import annotations

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.plans import explain


def _plan(spark, sf_dir, sql):
    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return explain.formatted_plan(spark.sql(sql))


def test_preference_family_no_cartesian(spark, sf_dir):
    from dataset_batch_processor_spark.operators import preference

    for sql in (
        preference.PREF_PAIRS_SPARK,
        preference.BESTOF_SPARK,
        preference.WINRATE_SPARK,
    ):
        plan = _plan(spark, sf_dir, sql)
        assert "CartesianProduct" not in plan, plan
        # the only windows are doc-keyed (ranked): never SinglePartition
        assert "SinglePartition" not in plan, plan


def test_langid_no_cartesian_no_global_window(spark, sf_dir):
    from dataset_batch_processor_spark.operators import langid

    for sql in (langid.LANGID_TRAIN_SPARK, langid.LANGID_EVAL_SPARK):
        plan = _plan(spark, sf_dir, sql)
        assert "CartesianProduct" not in plan, plan
        # exactly one SinglePartition exchange is expected and benign:
        # the prior-denominator scalar aggregate over the 4-row pric
        # table (constant-sized at any corpus scale — the k-row driver
        # pattern, not a data window)
        assert plan.count("SinglePartition") <= 1, plan


def test_chunk_windows_keyed(spark, sf_dir):
    from dataset_batch_processor_spark.operators import chat

    plan = _plan(spark, sf_dir, chat.CHUNK_WINDOWS_SPARK)
    assert "SinglePartition" not in plan, plan


def test_mm_token_plan_single_pass(spark, sf_dir):
    from dataset_batch_processor_spark.operators import chat

    plan = _plan(spark, sf_dir, chat.MM_CHAT_PLAN_SPARK)
    assert "SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan, plan
