"""Session-scoped scratch-parquet materialization.

Shared by every build-once-probe-forever index in the engine (the LSH
pair graph, the CC label table): the first consumer in a session
materializes the DataFrame to a scratch parquet directory, every
later consumer scans that. A materialized table — not ``persist()``
— on purpose: it survives ``spark.catalog.clearCache()`` between
bench/driver queries, and it is the local-mode twin of the production
recipe (write the index bucketed once, equi-join it thereafter).

Keyed on ``sparkContext.applicationId`` (stable and unique per
session) rather than ``id(spark)``: CPython reuses object ids after
garbage collection, which could hand a new session a stale cache
entry."""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[str, str, str], str] = {}


def materialize_once(
    spark: SparkSession, kind: str, key: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return ``build()``'s result as a scratch-parquet scan, building
    at most once per (session, kind, key)."""
    ck = (spark.sparkContext.applicationId, kind, os.path.abspath(key))
    path = _CACHE.get(ck)
    if path is None:
        path = os.path.join(tempfile.mkdtemp(prefix=f"dbp_{kind}_"), kind)
        build().write.parquet(path)
        _CACHE[ck] = path
    return spark.read.parquet(path)
