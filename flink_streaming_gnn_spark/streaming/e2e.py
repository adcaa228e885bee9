"""End-to-end streaming pipelines as driver-checkable keys — REAL
Structured Streaming executions (multi-micro-batch replay, state store,
foreachBatch sinks), not batch twins, whose *final* state is nevertheless
deterministic and therefore exactly oracle-checkable:

* ``stream_windowed_topk`` — the foreachBatch complete-mode re-rank
  (``streaming/topk.py``): after the last trigger the overwritten sink
  holds the top-k over ALL events, which equals the batch hourly top-k.
* ``stream_cdc_snapshot`` — the foreachBatch CDC apply + merge-on-read
  (``streaming/cdc.py``): each micro-batch appends its latest-per-user
  rows; the global latest row survives the merge-on-read rank regardless
  of how events were split across batches, so the snapshot equals the
  batch ``cdc_latest_snapshot``.

These two keys exist so the official correctness artifact attests the
streaming engine path end-to-end (source → watermarked stateful agg →
foreachBatch sink → readback), not just the batch twins; the same
equivalences are pinned as pytest batch≡stream properties in
tests/test_streaming.py.

Scale posture: both sinks are state-store-sized (windowed aggregate /
per-user latest), never raw-stream-sized; checkpoint + availableNow make
the replay exactly-once.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from flink_streaming_gnn_spark.streaming.cdc import read_snapshot, run_cdc_apply
from flink_streaming_gnn_spark.streaming.topk import TOP_K, run_windowed_topk


def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stream to completion, return the sink as a lazy scan — no
    driver materialization (the sink dir outlives the call; checkpoints
    are deleted once drained)."""
    out = tempfile.mkdtemp(prefix="stream_topk_out_")
    ckpt = tempfile.mkdtemp(prefix="stream_topk_ckpt_")
    try:
        run_windowed_topk(spark, sf_dir, out, ckpt)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.read.parquet(out)


def stream_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = tempfile.mkdtemp(prefix="stream_cdc_log_")
    ckpt = tempfile.mkdtemp(prefix="stream_cdc_ckpt_")
    try:
        run_cdc_apply(spark, sf_dir, log, ckpt)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return read_snapshot(spark, log)


QUERIES = {
    "stream_windowed_topk": stream_windowed_topk,
    "stream_cdc_snapshot": stream_cdc_snapshot,
}

ORACLE = {
    # final overwritten sink state == batch hourly top-k over all events
    "stream_windowed_topk": f"""
        WITH agg AS (
            SELECT date_trunc('hour', ts) AS win_start, user_id,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        ),
        ranked AS (
            SELECT win_start, user_id, n_events,
                   row_number() OVER (
                       PARTITION BY win_start
                       ORDER BY n_events DESC, user_id
                   ) AS rn
            FROM agg
        )
        SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
               user_id,
               CAST(n_events AS BIGINT) AS n_events,
               CAST(rn AS BIGINT) AS rank
        FROM ranked WHERE rn <= {TOP_K}
    """,
    # merge-on-read over the streamed changelog == batch latest-state
    "stream_cdc_snapshot": """
        WITH ranked AS (
            SELECT user_id, ts, event_id, event_type, value,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        SELECT user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_seen,
               event_type AS last_type,
               value AS last_value
        FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
}
