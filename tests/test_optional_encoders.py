"""Model-backed encoder auto-wire (r13 verdict item 4): wiring tests
that run everywhere + a live test skipped unless the public library
is installed — the optional_codecs/HEIC skip pattern."""

from __future__ import annotations

import pickle
import sys

import pytest

sys.path.insert(0, "/root/repo")

from dataset_batch_processor_spark.operators import embed, optional_encoders


def _has_st() -> bool:
    try:
        import sentence_transformers  # noqa: F401

        return True
    except ImportError:
        return False


def test_probe_is_consistent_with_environment():
    """The auto-wire ran at embed import; its outcome must match the
    actual importability of the library — wired when present, absent
    (with the registry's precise error) when not."""
    reg = optional_encoders.try_register_optional_encoders(
        embed.register_encoder
    )
    if _has_st():
        assert reg.get("st_minilm") == "sentence-transformers"
        assert "st_minilm" in embed._ENCODERS
        assert embed._ENCODERS["st_minilm"][1] == optional_encoders.ST_DIM
    else:
        assert "st_minilm" not in reg
        with pytest.raises(ValueError, match="unknown encoder"):
            embed.embed_text(None, encoder="st_minilm")


def test_lazy_encoder_pickles_without_model_handle():
    """The embed.py registry contract: mapInPandas cloudpickles the
    encoder into workers, so it must round-trip WITHOUT the memoized
    model (each worker rebuilds lazily)."""
    enc = optional_encoders.LazyModelEncoder(
        "some.module", "SomeLoader", "some-model", 7
    )
    enc._model = object()  # un-picklable sentinel: must not travel
    clone = pickle.loads(pickle.dumps(enc))
    assert clone._model is None
    assert (clone.loader_import, clone.loader_attr,
            clone.model_name, clone.dim) == (
        "some.module", "SomeLoader", "some-model", 7)


def test_lazy_encoder_builds_model_via_loader_spec(monkeypatch):
    """First call imports the loader module and constructs the model
    once; dim mismatches raise (fed to the quarantine path by the
    caller)."""
    import types

    calls = []

    class FakeModel:
        def __init__(self, name):
            calls.append(name)

        def encode(self, texts):
            return [[1.0, 2.0] for _ in texts]

    fake = types.ModuleType("fake_embed_lib")
    fake.Loader = FakeModel
    monkeypatch.setitem(sys.modules, "fake_embed_lib", fake)

    enc = optional_encoders.LazyModelEncoder(
        "fake_embed_lib", "Loader", "m1", 2
    )
    assert enc(["a", "b"]) == [[1.0, 2.0], [1.0, 2.0]]
    assert enc(["c"]) == [[1.0, 2.0]]
    assert calls == ["m1"]  # constructed exactly once

    bad = optional_encoders.LazyModelEncoder(
        "fake_embed_lib", "Loader", "m2", 3
    )
    with pytest.raises(ValueError, match="dim"):
        bad(["x"])


@pytest.mark.skipif(not _has_st(), reason="sentence-transformers not "
                    "installed (container ships without it; a full "
                    "deployment auto-wires it)")
def test_live_sentence_transformer_through_gated_stage(spark, sf_dir):
    """LIVE: the real model runs through the identical mapInPandas
    stage (skipped here, runs on a full install)."""
    from dataset_batch_processor_spark import catalog

    docs = catalog.load_table(spark, sf_dir, "documents").limit(4)
    out = embed.embed_text(docs, encoder="st_minilm").collect()
    assert len(out) == 4
    assert all(len(r.embedding) == optional_encoders.ST_DIM for r in out)
