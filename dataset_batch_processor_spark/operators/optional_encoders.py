"""Optional model-backed text encoders (r13 verdict item 4).

The optional_codecs.py pattern applied to ``embed.register_encoder``:
when a public embedding library IS importable (a full deployment),
a real model-backed encoder is registered at import time alongside
the deterministic feathash default; when it is not, nothing changes —
the gated feathash stage keeps the oracle contract and callers who
name a missing encoder get the registry's precise error (the
quarantine-style fallback).

Encoder objects are PICKLABLE BY CONSTRUCTION (the embed.py registry
contract: mapInPandas cloudpickles the function object into Python
workers). The heavy model handle is built lazily per worker process
on first call and memoized on the instance; ``__reduce__`` pins that
the memo never travels with the pickle, so a driver-side warm model
cannot be serialized into tasks.
"""

from __future__ import annotations

#: filled by :func:`try_register_optional_encoders` — name -> library
REGISTERED: dict[str, str] = {}

ST_MODEL_NAME = "sentence-transformers/all-MiniLM-L6-v2"
ST_DIM = 384


class LazyModelEncoder:
    """Batch encoder whose model handle is constructed lazily inside
    the worker (first call) from a picklable spec: ``loader_import``
    names a module, ``loader_attr`` a callable in it that takes
    ``model_name`` and returns an object with ``.encode(list[str])
    -> array-like`` (the sentence-transformers surface)."""

    def __init__(self, loader_import: str, loader_attr: str,
                 model_name: str, dim: int):
        self.loader_import = loader_import
        self.loader_attr = loader_attr
        self.model_name = model_name
        self.dim = dim
        self._model = None

    def __call__(self, texts: list) -> list:
        if self._model is None:
            import importlib

            mod = importlib.import_module(self.loader_import)
            self._model = getattr(mod, self.loader_attr)(self.model_name)
        vecs = self._model.encode(list(texts))
        out = [[float(x) for x in v] for v in vecs]
        for v in out:
            if len(v) != self.dim:
                raise ValueError(
                    f"encoder {self.model_name!r} returned dim {len(v)},"
                    f" registered dim {self.dim}"
                )
        return out

    def __reduce__(self):
        # never pickle the memoized model handle; workers rebuild it
        return (
            LazyModelEncoder,
            (self.loader_import, self.loader_attr,
             self.model_name, self.dim),
        )


def try_register_optional_encoders(register=None) -> dict[str, str]:
    """Probe public embedding libraries and register what is present.
    Idempotent; returns the REGISTERED map. ``register`` defaults to
    embed.register_encoder (parameterized for tests and to avoid an
    import cycle at embed.py's tail)."""
    if register is None:
        from .embed import register_encoder as register
    try:
        import sentence_transformers  # noqa: F401
    except ImportError:
        pass
    else:
        register(
            "st_minilm",
            LazyModelEncoder(
                "sentence_transformers", "SentenceTransformer",
                ST_MODEL_NAME, ST_DIM,
            ),
            ST_DIM,
        )
        REGISTERED["st_minilm"] = "sentence-transformers"
    return REGISTERED
