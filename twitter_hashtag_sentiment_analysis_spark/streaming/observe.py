"""Streaming observability (reference R9/R10 analog).

The reference polls ``describe_delivery_stream`` until the Firehose
reports ACTIVE and logs per-record outcomes to CloudWatch
(stream_processor.py:356-378). Structured Streaming's native surface
for both is ``StreamingQueryListener`` (per-micro-batch progress
events: rows read, processing rate, state size) plus
``StreamingQuery.status`` for readiness. This module packages them as
a capture listener and a readiness wait.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery, StreamingQueryListener


@dataclass
class BatchProgress:
    """One micro-batch commit, flattened from the progress event."""

    query_id: str
    query_name: str | None
    batch_id: int
    num_input_rows: int
    timestamp: str


class ProgressCapture(StreamingQueryListener):
    """Listener that records every micro-batch progress event.

    Usage::

        cap = ProgressCapture.attach(spark)
        try:
            ...run streaming queries...
            cap.wait_for_rows(1, timeout=60)
        finally:
            cap.detach(spark)
    """

    def __init__(self) -> None:
        super().__init__()
        self.events: list[BatchProgress] = []
        self._lock = threading.Lock()

    # StreamingQueryListener callbacks run on Spark's listener-bus thread
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802 (Spark API)
        p = event.progress
        with self._lock:
            self.events.append(
                BatchProgress(
                    query_id=str(p.id),
                    query_name=p.name,
                    batch_id=p.batchId,
                    num_input_rows=p.numInputRows,
                    timestamp=p.timestamp,
                )
            )

    def onQueryIdle(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    @classmethod
    def attach(cls, spark: SparkSession) -> "ProgressCapture":
        cap = cls()
        spark.streams.addListener(cap)
        return cap

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)

    def total_input_rows(self) -> int:
        with self._lock:
            return sum(e.num_input_rows for e in self.events)

    def wait_for_rows(self, n: int, timeout: float = 60.0) -> bool:
        """Block until >= n input rows have been committed across
        captured micro-batches (listener events are delivered
        asynchronously, so draining a query does not imply the progress
        event arrived yet)."""
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if self.total_input_rows() >= n:
                return True
            time.sleep(0.1)
        return False


def wait_until_active(query: StreamingQuery, timeout: float = 60.0) -> bool:
    """Readiness poll — the ``describe_delivery_stream``-until-ACTIVE
    analog (stream_processor.py:356-378): block until the query has
    left initialization and is processing or waiting for data."""
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if query.exception() is not None:
            return False
        if "Initializing" not in (query.status["message"] or ""):
            return True
        time.sleep(0.1)
    return False
