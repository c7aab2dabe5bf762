"""Image↔caption alignment gate: the planted-mismatch fixture must be
caught EXACTLY (all plants routed out, zero matched pairs lost), the
separation margin must be wide, and the caption join must broadcast."""

from __future__ import annotations

from dataset_batch_processor_spark.multimodal import alignment


def test_gate_catches_all_plants_and_only_plants(spark, sf_dir):
    rows = alignment._q_caption_alignment(spark, sf_dir).collect()
    assert len(rows) == 500
    planted = {
        r["image_id"]
        for r in rows
        if r["image_id"] % alignment.PLANT_MOD == alignment.PLANT_RESIDUE
    }
    routed_out = {r["image_id"] for r in rows if r["route"] == "mismatched"}
    assert routed_out == planted
    assert len(planted) > 50


def test_separation_margin(spark, sf_dir):
    """Both classes sit far from the threshold — the gate is not a
    knife-edge fixture artifact (module docstring records the measured
    bands on the id lattice)."""
    rows = alignment._q_caption_alignment(spark, sf_dir).collect()
    matched = [r["cos_fx6"] for r in rows if r["route"] == "aligned"]
    plants = [r["cos_fx6"] for r in rows if r["route"] == "mismatched"]
    assert min(matched) >= alignment.ALIGN_THRESH + 40_000
    assert max(plants) <= alignment.ALIGN_THRESH - 90_000


def test_stated_seed_parse_matches_plant_formula(spark, sf_dir):
    rows = alignment._q_caption_alignment(spark, sf_dir).collect()
    for r in rows[:100]:
        d = r["image_id"]
        true_seed = (d * 31) % 256
        exp = (
            (true_seed + alignment.SEED_SHIFT) % 256
            if d % alignment.PLANT_MOD == alignment.PLANT_RESIDUE
            else true_seed
        )
        assert r["stated_seed"] == exp


def test_caption_join_is_broadcast(spark, sf_dir):
    from dataset_batch_processor_spark.plans import explain

    df = alignment._q_caption_alignment(spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    # the 256-row predicted-histogram dim must never sort-merge
    assert "SortMergeJoin" not in plan, plan
