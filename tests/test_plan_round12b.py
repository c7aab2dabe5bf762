"""Plan-shape pins for the round-12 second-wave gates: every new
family must keep its windows doc-/cluster-keyed (no single-task
global window), its small relations broadcast, and no cartesians.
These guard the 100 TB story the scale study measured."""

from __future__ import annotations

import re

from dataset_batch_processor_spark.operators import (
    canary,
    components,
    corpusstats,
    curation,
    lmobjectives,
    rlvr,
)
from dataset_batch_processor_spark.plans import explain


def _unpartitioned_windows(plan: str) -> list[str]:
    # windowspecdefinition(part_cols..., sort ASC ..., frame); with NO
    # partition columns the FIRST argument is already the sort spec.
    # `_pid` windows are the prefix-sum totals pass (one row per
    # partition) — the intended bounded funnel.
    return [
        m.group(1)
        for m in re.finditer(r"windowspecdefinition\(([^,)]*)", plan)
        if re.search(r"\s(ASC|DESC)\b", m.group(1))
        and not m.group(1).startswith("_pid")
    ]


def test_rlvr_grade_windows_doc_keyed(spark, sf_dir):
    df = rlvr.QUERIES["docs_verifier_grade"](spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert _unpartitioned_windows(plan) == []


def test_rlvr_passk_comb_broadcasts(spark, sf_dir):
    """The 36-row binomial relation must broadcast — a shuffled join
    against a constant table would be a planning bug."""
    df = rlvr.QUERIES["docs_passk_estimate"](spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert explain.broadcast_join_count(df) >= 1


def test_ul2_windows_doc_keyed(spark, sf_dir):
    df = lmobjectives.QUERIES["docs_ul2_denoiser_mix"](spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert _unpartitioned_windows(plan) == []


def test_cluster_capped_sample_window_cluster_keyed(spark, sf_dir):
    df = components.QUERIES["docs_cluster_capped_sample"](spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert _unpartitioned_windows(plan) == []
    # singletons arrive via an anti join, never a full-corpus window
    assert "LeftAnti" in plan


def test_canary_scan_no_windows_no_cartesian(spark, sf_dir):
    df = canary.QUERIES["docs_canary_leak_card"](spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # pure explode + joins + aggregates


def test_longctx_plan_no_global_window(spark, sf_dir):
    df = corpusstats.QUERIES["docs_longctx_upsample_plan"](spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert _unpartitioned_windows(plan) == []
    assert "CartesianProduct" not in plan  # 1-row totals broadcast


def test_resume_slice_rides_prefix_sum(spark, sf_dir):
    """The rank attachment must be the two-pass prefix sum, never a
    naive global row_number window."""
    df = curation.QUERIES["docs_shuffle_resume_slice"](spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert _unpartitioned_windows(plan) == []


def test_verifier_dpo_pairs_doc_keyed(spark, sf_dir):
    from dataset_batch_processor_spark.operators import rlvr

    df = rlvr.QUERIES["docs_verifier_dpo_pairs"](spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert _unpartitioned_windows(plan) == []


def test_rlvr_curriculum_rides_prefix_sum(spark, sf_dir):
    from dataset_batch_processor_spark.operators import rlvr

    df = rlvr.QUERIES["docs_rlvr_curriculum"](spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert _unpartitioned_windows(plan) == []


def test_anneal_schedule_totals_broadcast(spark, sf_dir):
    from dataset_batch_processor_spark.operators import curriculum

    df = curriculum.QUERIES["docs_anneal_mixture_schedule"](spark, sf_dir)
    plan = explain.formatted_plan(df)
    # the 1-row totals cross join must broadcast, never shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert _unpartitioned_windows(plan) == []
