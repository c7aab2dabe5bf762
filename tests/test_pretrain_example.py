"""End-to-end pretraining data-order example: the round-12 families
compose, the anneal slice is the schedule's top quarter, and the FFD
bins respect capacity at high fill."""

from __future__ import annotations

import importlib.util
import os

from dataset_batch_processor_spark.operators import curriculum, ffdpack

_spec = importlib.util.spec_from_file_location(
    "pretrain_pipeline",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "pretrain_pipeline.py",
    ),
)
pretrain_pipeline = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and pretrain_pipeline)

SF = "/root/testdata/sf0.001"


def test_pretrain_pipeline_end_to_end(spark):
    m = pretrain_pipeline.run(spark, SF)
    # the anneal slice is the schedule's top quarter and every one of
    # its docs is packed exactly once
    card = {
        r["phase"]: r for r in curriculum._q_curriculum(spark, SF).collect()
    }
    assert m["anneal_docs"] == card[curriculum.N_PHASES - 1]["n_docs"]
    assert m["anneal_docs_packed"] == m["anneal_docs"]
    # FFD on the high-quality slice is tight: >90% padded fill, and
    # far fewer bins than unpacked docs
    assert m["anneal_fill_ppm"] > 900_000
    assert m["anneal_bins"] < m["anneal_docs"] // 2
    # the example restored the full documents view for later stages
    assert (
        spark.table("documents").count()
        == sum(int(r["n_docs"]) for r in card.values())
    )
    assert m["phases"] == curriculum.N_PHASES
    assert m["recipe_sources"] == 20
