"""As-of and range join semantics against hand-computed cases."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from dataset_batch_processor_spark.operators import temporal


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(key=1, t=ts("2024-01-01T10:00:00"), lid=100),  # after r1
            Row(key=1, t=ts("2024-01-01T12:00:00"), lid=101),  # == r2 ts (tie)
            Row(key=1, t=ts("2024-01-01T09:00:00"), lid=102),  # before any
            Row(key=2, t=ts("2024-01-01T10:00:00"), lid=200),  # other key
        ]
    )
    right = spark.createDataFrame(
        [
            Row(key=1, rt=ts("2024-01-01T09:30:00"), rid=7),
            Row(key=1, rt=ts("2024-01-01T12:00:00"), rid=8),  # simultaneous
            Row(key=1, rt=ts("2024-01-01T12:00:00"), rid=9),  # tie: max rid wins
            Row(key=2, rt=ts("2024-01-01T08:00:00"), rid=5),
        ]
    )
    out = temporal.asof_join(
        left, right, on="key", left_ts="t", right_ts="rt", right_cols=["rid"]
    )
    got = {r.lid: r.asof_rid for r in out.collect()}
    assert got == {
        100: 7,    # latest right at/before 10:00 is 09:30
        101: 9,    # simultaneous right matches; tie -> larger rid
        102: None, # nothing precedes 09:00
        200: 5,
    }


def test_range_join_bounds(spark):
    left = spark.createDataFrame([Row(k=1, t=ts("2024-01-01T00:00:00"), lid=1)])
    right = spark.createDataFrame(
        [
            Row(k2=1, rt=ts("2024-01-01T00:00:00"), rid=1),  # inclusive lower
            Row(k2=1, rt=ts("2024-01-01T00:59:59"), rid=2),  # inside
            Row(k2=1, rt=ts("2024-01-01T01:00:00"), rid=3),  # exclusive upper
            Row(k2=2, rt=ts("2024-01-01T00:30:00"), rid=4),  # wrong key
        ]
    )
    out = temporal.range_join(
        left, right, on=("k", "k2"), left_ts="t", right_ts="rt",
        lower="INTERVAL 0 SECOND", upper="INTERVAL 1 HOUR",
    )
    assert sorted(r.rid for r in out.collect()) == [1, 2]


def test_asof_one_shuffle(spark):
    """The union+window construction costs one data shuffle (window
    partition) — the scale property that beats inequality-join+argmax."""
    from dataset_batch_processor_spark.plans import explain

    left = spark.createDataFrame([Row(key=1, t=ts("2024-01-01T10:00:00"), lid=1)])
    right = spark.createDataFrame([Row(key=1, rt=ts("2024-01-01T09:00:00"), rid=1)])
    out = temporal.asof_join(
        left, right, on="key", left_ts="t", right_ts="rt", right_cols=["rid"]
    )
    assert explain.count_exchanges(out) <= 1


def test_asof_tie_break_on_string_ids(spark):
    # Non-numeric right-id columns must still resolve timestamp ties
    # deterministically (a cast-to-long tie key would NULL them out).
    left = spark.createDataFrame([Row(key=1, t=ts("2024-01-01T12:00:00"), lid=1)])
    right = spark.createDataFrame(
        [
            Row(key=1, rt=ts("2024-01-01T12:00:00"), rname="alpha"),
            Row(key=1, rt=ts("2024-01-01T12:00:00"), rname="zeta"),
        ]
    )
    back = temporal.asof_join(
        left, right, on="key", left_ts="t", right_ts="rt", right_cols=["rname"]
    )
    assert back.collect()[0].asof_rname == "zeta"  # largest id wins
    fwd = temporal.asof_join_forward(
        left, right, on="key", left_ts="t", right_ts="rt", right_cols=["rname"]
    )
    assert fwd.collect()[0].asof_rname == "alpha"  # smallest id wins
