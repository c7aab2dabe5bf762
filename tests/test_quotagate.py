"""Streaming per-source quota admission: arrival-order invariance,
idempotent retry commits, batch parity, and the associativity claim
(bottom-k of per-shard bottom-k's == global bottom-k) checked
independently in Python."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import curation
from dataset_batch_processor_spark.streaming import quotagate

SF = "/root/testdata/sf0.001"


def _sample_from_partials(spark, docs, splits, commits_dir):
    for batch_id, pred in enumerate(splits):
        out = os.path.join(commits_dir, f"batch_id={batch_id}")
        quotagate.quota_partial(docs.filter(pred)).write.mode(
            "overwrite"
        ).parquet(out)
    return sorted(
        tuple(r)
        for r in quotagate.read_quota(spark, commits_dir).collect()
    )


def test_arrival_order_invariant_and_batch_parity(spark, tmp_path):
    docs = catalog.load_table(spark, SF, "documents").select(
        "doc_id", "source"
    )
    a = _sample_from_partials(
        spark, docs,
        [F.col("doc_id") % 3 == i for i in (0, 1, 2)],
        str(tmp_path / "qa"),
    )
    b = _sample_from_partials(
        spark, docs,
        [F.col("doc_id") % 3 == i for i in (2, 0, 1)],
        str(tmp_path / "qb"),
    )
    assert a == b
    batch = sorted(
        tuple(r)
        for r in curation.QUERIES["docs_quota_sample"](
            spark, SF
        ).collect()
    )
    assert a == batch


def test_retried_batch_replaces_its_partition(spark, tmp_path):
    docs = catalog.load_table(spark, SF, "documents").select(
        "doc_id", "source"
    )
    commits = str(tmp_path / "qr")
    splits = [F.col("doc_id") % 2 == i for i in (0, 1)]
    first = _sample_from_partials(spark, docs, splits, commits)
    quotagate.quota_partial(docs.filter(splits[0])).write.mode(
        "overwrite"
    ).parquet(os.path.join(commits, "batch_id=0"))
    again = sorted(
        tuple(r)
        for r in quotagate.read_quota(spark, commits).collect()
    )
    assert again == first


def test_bottomk_merge_is_associative_python():
    """The exactness argument, independent of Spark: merging
    per-shard bottom-k's reproduces the global bottom-k for every
    sharding of the fixture draws."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT source, doc_id FROM"
        f" read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    k = curation.QUOTA_K

    def draw(source, doc_id):
        return int(
            hashlib.md5(f"{source}#{doc_id}".encode()).hexdigest()[:15],
            16,
        )

    def bottomk(items):
        by_src = {}
        for source, doc_id in items:
            by_src.setdefault(source, []).append(
                (draw(source, doc_id), doc_id, source)
            )
        out = []
        for source, lst in by_src.items():
            out += [
                (source, d) for _h, d, _s in sorted(lst)[:k]
            ]
        return out

    exact = sorted(bottomk(rows))
    for mod in (2, 3, 5):
        shards = [
            [r for r in rows if r[1] % mod == i] for i in range(mod)
        ]
        merged = sorted(
            bottomk([x for s in shards for x in bottomk(s)])
        )
        assert merged == exact, mod
