"""Observability operators — the reference's latency/throughput sink
(SURVEY.md §2A A15) re-expressed Spark-first.

The reference bolts metric counters onto a terminal operator; Spark's
native mechanism is ``df.observe()`` — named aggregate expressions
evaluated *inside* the job as it runs, collected from the listener bus (no
second pass over the data, works identically under batch and Structured
Streaming where the same observation surfaces per micro-batch in
``StreamingQueryProgress.observedMetrics``).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, *metrics: F.Column) -> tuple[DataFrame, Observation]:
    """Attach named metric expressions to a DataFrame; after any action on
    the returned frame, ``observation.get`` yields the metric values."""
    obs = Observation()
    return df.observe(obs, *metrics), obs


def run_with_metrics(df: DataFrame, *metrics: F.Column) -> dict:
    """Execute ``df`` to the noop sink, returning its observed metrics plus
    wall-clock seconds and rows/sec throughput (requires a
    ``count(*) AS n_rows`` style metric named ``n_rows``; one is added if
    absent)."""
    names = [m._jc.toString() for m in metrics]
    cols = list(metrics)
    if not any("n_rows" in n for n in names):
        cols.append(F.count(F.lit(1)).alias("n_rows"))
    out, obs = observed(df, *cols)
    t0 = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    got = dict(obs.get)
    got["wall_sec"] = round(wall, 4)
    if got.get("n_rows"):
        got["rows_per_sec"] = round(got["n_rows"] / wall, 1)
    return got
