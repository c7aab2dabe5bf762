"""Session-shared shard staging for the availableNow streaming twins.

Round 13 (VERDICT r12 next #4): every twin used to rewrite its
n-shard parquet staging on EVERY run — pure fixture setup,
deterministic per (session, dataset). The staging is now built once
per (session, kind, dataset) through ``matcache.staged_once`` and
shared across runs/reps, like every other session-scoped artifact;
bench.py pre-builds them in warmup so each twin's recorded timing is
the drain loop, not fixture I/O.

The write layout is IDENTICAL to the old per-run writes (one
``coalesce(1)`` append per ``doc_id % n_shards`` slice, in slice
order), because two twins (turn admission, incremental LSH) are
first-wins loops whose output is gated UNDER this specific arrival
order: same file count, same per-file contents, same append sequence
=> ``maxFilesPerTrigger=1`` drains the identical micro-batch
sequence. The per-run checkpoint/commit work dirs deliberately stay
fresh ``scratch_dir`` state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..matcache import staged_once


def stage_mod_shards(
    docs: DataFrame, kind: str, key: str, n_shards: int = 3
) -> str:
    """Stage ``docs`` as ``n_shards`` single-file parquet appends
    split by ``doc_id % n_shards`` (slice order preserved), once per
    (session, kind, key); returns the staging directory."""

    def write(path: str) -> None:
        for part in range(n_shards):
            docs.filter(F.col("doc_id") % n_shards == part).coalesce(
                1
            ).write.mode("append").parquet(path)

    # layout parameters are cache identity (r13 ADVICE): a second
    # caller reusing `kind` with another shard count or schema gets
    # its own staging dir instead of silently sharing this one
    layout = f"mod{n_shards}|{','.join(docs.columns)}"
    return staged_once(docs.sparkSession, kind, key, write, layout=layout)
