"""Scratch lifecycle for materialized indexes (matcache.py): build-
once semantics, registered cleanup, and race-safe publication."""

from __future__ import annotations

import os

from dataset_batch_processor_spark import matcache


def test_materialize_once_builds_once(spark):
    calls = []

    def build():
        calls.append(1)
        return spark.range(5).toDF("v")

    a = matcache.materialize_once(spark, "t_once", "/k1", build)
    b = matcache.materialize_once(spark, "t_once", "/k1", build)
    assert len(calls) == 1
    assert a.count() == 5 and b.count() == 5


def test_cleanup_scratch_removes_dirs_and_cache(spark):
    matcache.materialize_once(
        spark, "t_clean", "/k2", lambda: spark.range(3).toDF("v")
    )
    created = [d for d in matcache._SCRATCH_DIRS if "t_clean" in d]
    assert created and all(os.path.isdir(d) for d in created)
    matcache.cleanup_scratch()
    assert not matcache._SCRATCH_DIRS
    assert not matcache._CACHE
    assert all(not os.path.exists(d) for d in created)
    # a rebuild after cleanup works (cache was dropped, not wedged)
    again = matcache.materialize_once(
        spark, "t_clean", "/k2", lambda: spark.range(3).toDF("v")
    )
    assert again.count() == 3
    matcache.cleanup_scratch()


def test_scratch_root_override(spark, tmp_path):
    matcache.set_scratch_root(str(tmp_path))
    try:
        d = matcache.scratch_dir("dbp_rooted_")
        assert os.path.dirname(d) == str(tmp_path)
    finally:
        matcache.set_scratch_root(None)
        matcache.cleanup_scratch()
