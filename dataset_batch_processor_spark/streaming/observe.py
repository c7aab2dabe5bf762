"""Streaming observability: per-micro-batch metrics without a second
aggregation.

The production monitoring pattern (Spark's documented
``Dataset.observe`` + ``StreamingQueryListener`` pairing): metrics
are computed INSIDE the existing micro-batch plan — one accumulator
ride-along, no extra pass over the data, no second query competing
for the source — and surface through the listener callback where an
operator ships them to its metrics system.

``MetricsRecorder`` is the reusable listener: it captures batch id,
input row counts, durations, and every observed-metrics row, in
memory, for tests and for callers that poll. A service subclass
would override ``on_progress`` to emit instead of append.

Scale note: observe() metrics are Catalyst aggregates merged on the
driver per batch — constant driver traffic per batch, independent of
batch size. The listener runs on the driver's listener bus; keep
``on_progress`` non-blocking (ship async) or batches queue behind it.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def observed(df: DataFrame, name: str, *metrics) -> DataFrame:
    """Attach observed metrics to a streaming (or batch) DataFrame.
    Default metric set: row count."""
    if not metrics:
        metrics = (F.count(F.lit(1)).alias("n_rows"),)
    return df.observe(name, *metrics)


class MetricsRecorder(StreamingQueryListener):
    """Collects per-batch progress: (batch_id, num_input_rows,
    duration_ms, {observation_name: {metric: value}})."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.batches: list[dict] = []

    # -- StreamingQueryListener interface
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rec = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "duration_ms": dict(p.durationMs or {}),
            "observed": {
                # observedMetrics values are Rows, not mappings
                k: v.asDict() for k, v in (p.observedMetrics or {}).items()
            },
        }
        with self._lock:
            self.batches.append(rec)
        self.on_progress(rec)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- extension point
    def on_progress(self, record: dict) -> None:
        """Override to ship metrics; must not block the listener bus."""

    # -- conveniences
    def total_input_rows(self) -> int:
        with self._lock:
            return sum(b["num_input_rows"] for b in self.batches)

    def observed_series(self, name: str, metric: str) -> list:
        with self._lock:
            return [
                b["observed"][name][metric]
                for b in self.batches
                if name in b["observed"]
            ]
