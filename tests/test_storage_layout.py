"""File-layout operations (sources/storage.py): compaction and
range-sorted writes, audited through the parquet footers themselves.
"""

from __future__ import annotations

import glob
import tempfile

from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.sources import storage


def test_compaction_reduces_files_and_preserves_rows(spark, sf_dir):
    orders = catalog.load_table(spark, sf_dir, "orders")
    src = tempfile.mkdtemp(prefix="dbp_small_") + "/orders"
    # simulate a small-files mess: 40 files for a tiny table
    orders.repartition(40).write.parquet(src)
    dst = tempfile.mkdtemp(prefix="dbp_compact_") + "/orders"
    before, after = storage.compact_parquet_dir(
        spark, src, dst, target_rows_per_file=100_000
    )
    assert before == 40
    assert after == 1
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compaction_rejects_hive_partitioned_source(spark, sf_dir):
    import pytest

    orders = catalog.load_table(spark, sf_dir, "orders")
    src = tempfile.mkdtemp(prefix="dbp_part_") + "/orders"
    orders.write.partitionBy("o_orderpriority").parquet(src)
    with pytest.raises(ValueError, match="hive-partitioned"):
        storage.compact_parquet_dir(
            spark, src, src + "_out", target_rows_per_file=100_000
        )


def test_range_sorted_layout_gives_disjoint_file_ranges(spark, sf_dir):
    orders = catalog.load_table(spark, sf_dir, "orders")
    dst = tempfile.mkdtemp(prefix="dbp_sorted_") + "/orders"
    storage.write_range_sorted(orders, dst, "o_orderkey", n_files=8)
    assert len(glob.glob(f"{dst}/part-*.parquet")) == 8
    ranges = storage.parquet_file_ranges(dst, "o_orderkey")
    # footer stats: ranges sorted and pairwise disjoint -> a point
    # predicate prunes to exactly one file
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    # and Spark's scan actually skips: filter on one key reads < all rows
    key = orders.select(F.min("o_orderkey")).first()[0]
    hit = spark.read.parquet(dst).filter(F.col("o_orderkey") == key)
    assert hit.count() == 1


def test_unsorted_layout_has_overlapping_ranges(spark, sf_dir):
    """Counter-case: hash-partitioned writes give every file the full
    value range — nothing prunes. This is the measurable difference
    the sorted layout exists to create."""
    orders = catalog.load_table(spark, sf_dir, "orders")
    dst = tempfile.mkdtemp(prefix="dbp_hashed_") + "/orders"
    orders.repartition(8, "o_orderkey").write.parquet(dst)
    ranges = storage.parquet_file_ranges(dst, "o_orderkey")
    ranges.sort()
    overlaps = sum(
        1 for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]) if h1 >= l2
    )
    assert overlaps == len(ranges) - 1
