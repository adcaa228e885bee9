"""Streaming observability — the A15 latency/throughput sink for unbounded
queries (the batch half lives in operators/metrics.py via df.observe()).

A ``StreamingQueryListener`` receives every micro-batch's progress event
(rows, processing duration, state-store metrics, watermark) off the
listener bus — zero touch on the data path, exactly how the reference's
metric operators hang off the dataflow without re-processing records.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Collects per-micro-batch progress: rows, duration, derived rows/sec."""

    def __init__(self) -> None:
        self.batches: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        duration_ms = (p.durationMs or {}).get("triggerExecution", 0)
        self.batches.append(
            {
                "batch_id": p.batchId,
                "n_rows": p.numInputRows,
                "duration_ms": duration_ms,
                "rows_per_sec": (
                    round(p.numInputRows / (duration_ms / 1000.0), 1)
                    if duration_ms
                    else None
                ),
                "watermark": (p.eventTime or {}).get("watermark"),
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    @property
    def total_rows(self) -> int:
        return sum(b["n_rows"] for b in self.batches)

    def await_rows(self, expected: int, timeout_s: float = 30.0) -> int:
        """Listener-bus delivery is asynchronous — a query can finish before
        its last progress events arrive. Poll until ``expected`` rows have
        been accounted (or timeout) and return the count seen."""
        import time

        deadline = time.time() + timeout_s
        while self.total_rows < expected and time.time() < deadline:
            time.sleep(0.2)
        return self.total_rows


@contextmanager
def recorded_progress(spark: SparkSession):
    """Attach a ProgressRecorder for the lifetime of the block:

        with recorded_progress(spark) as rec:
            ... run streaming query to completion ...
        rec.total_rows, rec.batches
    """
    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    try:
        yield rec
    finally:
        spark.streams.removeListener(rec)
