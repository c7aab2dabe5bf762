"""Operational controls: cancellation and run metrics.

Cancellation parity (SURVEY.md §2.8/§4.1): the reference polls a
cooperative ``stop_event`` between elements
(/root/reference/modules/utils.py:4-9; checked per element at
filter_crop.py:37-38) — and the modular tiling DROPPED those checks
(SURVEY.md §2.9.7). Spark makes cancellation uniform and external:
every action runs under a job tag, and ``stop()`` cancels every job
carrying the tag from any thread — no per-element polling, no
operator-specific wiring, and it works identically on a
1000-executor cluster.

Metrics parity (A1): the reference returns counters in a status
string (filter_crop.py:33,52,61,67). Here a run returns a metrics
dict derived from the result DataFrame itself (the counters are
first-class queryable values, e.g. routing.route_counts).
"""

from __future__ import annotations

import threading
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession


@dataclass
class JobHandle:
    """A cancellable running job — the stop_event replacement."""

    spark: SparkSession
    group: str
    thread: threading.Thread
    result: dict[str, Any] = field(default_factory=dict)

    def stop(self) -> None:
        """Cancel every Spark job carrying this run's tag; the
        submitting thread sees the cancellation error."""
        self.spark.sparkContext.cancelJobsWithTag(self.group)

    def join(self, timeout: float | None = None) -> None:
        self.thread.join(timeout)

    @property
    def done(self) -> bool:
        return not self.thread.is_alive()


def run_cancellable(
    spark: SparkSession,
    action: Callable[[], Any],
    description: str = "dataset_batch_processor job",
) -> JobHandle:
    """Run ``action`` (something that triggers Spark jobs) in a
    background thread under a fresh job group; returns a handle whose
    ``stop()`` is the Stop button (start_app.py:96 parity)."""
    group = f"dbp-{uuid.uuid4().hex[:12]}"
    handle: JobHandle | None = None

    def target() -> None:
        # Job tags are thread-local on the SparkContext; attach the
        # tag in the submitting thread so all jobs the action spawns
        # are cancellable via cancelJobsWithTag (the Spark 4 API —
        # SparkContext.clearJobGroup was removed in PySpark 4.x).
        # interruptOnCancel preserves the old setJobGroup(...,
        # interruptOnCancel=True) behavior: cancellation interrupts
        # running task threads instead of letting a blocked element
        # run to completion (the reference's stop-button semantics).
        spark.sparkContext.setJobDescription(description)
        spark.sparkContext.setInterruptOnCancel(True)
        spark.sparkContext.addJobTag(group)
        try:
            h.result["value"] = action()
        except Exception as e:  # cancelled or failed: captured, not raised
            h.result["error"] = e
        finally:
            spark.sparkContext.removeJobTag(group)

    t = threading.Thread(target=target, daemon=True)
    h = JobHandle(spark=spark, group=group, thread=t)
    handle = h
    t.start()
    return handle
