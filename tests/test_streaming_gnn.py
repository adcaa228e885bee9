"""A8 windowed-forward batch≡stream test: the same windowed-SAGE plan run
over a multi-micro-batch replay of the edge stream must produce exactly the
batch result — the reference's windowed coalescing + batched tensor
forward, with Spark's state store doing the coalescing incrementally."""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table
from flink_streaming_gnn_spark.streaming.gnn import (
    edges_v_with_ts,
    graph_sage_windowed,
    windowed_sage,
)
from flink_streaming_gnn_spark.streaming.replay import run_to_completion
from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare_frames


def _edges_stream(spark, sf_dir, files_per_trigger=2):
    digest = hashlib.md5(f"edges{sf_dir}".encode()).hexdigest()[:8]
    chunk_dir = os.path.join(tempfile.gettempdir(), f"edge_chunks_{digest}")
    if not os.path.isdir(chunk_dir) or not os.listdir(chunk_dir):
        edges_v_with_ts(spark, sf_dir).repartition(8).write.mode("overwrite").parquet(
            chunk_dir
        )
    return (
        spark.readStream.schema("src_v long, dst_v long, ts timestamp")
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(chunk_dir)
    )


def test_windowed_sage_stream_equals_batch(spark):
    features = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").alias("feat")
    )
    streamed_plan = windowed_sage(_edges_stream(spark, SF_SMOKE), features)
    streamed = run_to_completion(streamed_plan, "windowed_sage_stream").toPandas()
    batch = graph_sage_windowed(spark, SF_SMOKE).toPandas()
    assert len(batch) > 0
    assert not compare_frames(streamed, batch, "windowed sage batch≡stream")


def test_window_coalesces_updates(spark):
    """The windowed aggregate must emit one row per (window, vertex) no
    matter how many edge arrivals hit that vertex — the A8 dedup."""
    out = graph_sage_windowed(spark, SF_SMOKE).toPandas()
    assert not out.duplicated(["yr", "vec_id"]).any()
    n_edges = edges_v_with_ts(spark, SF_SMOKE).count()
    assert len(out) < n_edges  # coalescing actually collapsed arrivals
