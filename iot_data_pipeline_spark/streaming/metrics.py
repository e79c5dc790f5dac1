"""Streaming observability: capture per-micro-batch progress metrics.

A production stream is operated from its progress telemetry -- input
rate, processing rate, batch duration, state size -- not from its output.
The reference's only observability was CloudWatch task logs (reference
README.md:194-204); Spark emits structured progress events per micro-
batch, and this module turns them into a queryable DataFrame.

Listener callbacks run on Spark's listener-bus thread, so the capture
appends to a lock-guarded list and defers ALL Spark calls (building the
DataFrame) to the caller's thread -- a listener that touches the session
can deadlock the bus.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_id string, run_id string, name string, batch_id long, "
    "timestamp string, num_input_rows long, "
    "input_rows_per_second double, processed_rows_per_second double, "
    "batch_duration_ms long"
)


class ProgressCapture(StreamingQueryListener):
    """Accumulates every micro-batch's progress as a plain dict."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._rows: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        row = {
            "query_id": p.get("id"),
            "run_id": p.get("runId"),
            "name": p.get("name"),
            "batch_id": p.get("batchId"),
            "timestamp": p.get("timestamp"),
            "num_input_rows": p.get("numInputRows"),
            "input_rows_per_second": float(p.get("inputRowsPerSecond") or 0.0),
            "processed_rows_per_second": float(
                p.get("processedRowsPerSecond") or 0.0
            ),
            "batch_duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
        }
        with self._lock:
            self._rows.append(row)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def rows(self) -> list[dict]:
        with self._lock:
            return list(self._rows)


def attach_progress_capture(spark: SparkSession) -> ProgressCapture:
    """Register a ProgressCapture on the session's listener bus."""
    cap = ProgressCapture()
    spark.streams.addListener(cap)
    return cap


def detach_progress_capture(spark: SparkSession, cap: ProgressCapture) -> None:
    spark.streams.removeListener(cap)


def progress_frame(spark: SparkSession, cap: ProgressCapture) -> DataFrame:
    """The captured telemetry as a DataFrame (call from the driver thread,
    never from inside a listener callback)."""
    rows = cap.rows()
    if not rows:
        return spark.createDataFrame([], PROGRESS_SCHEMA)
    return spark.createDataFrame(rows, PROGRESS_SCHEMA)
