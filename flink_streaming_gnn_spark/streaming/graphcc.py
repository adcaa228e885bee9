"""Streaming incremental connected components — the 14th end-to-end
streaming key, and the streaming-GRAPH capability a streaming-GNN engine
(reference §2A A1/A2: each lineitem row is one edge event with an event
time) is actually about: maintain component labels across micro-batches
of ARRIVING EDGES, never recomputing from the raw edge log.

Per micro-batch the maintained state is the star forest ``(v, lbl)`` —
every seen vertex pointing at its component's min vertex id. A new batch
of edges is unioned with the CONTRACTED prior state (each label row is
one edge v—lbl of a depth-1 star), and the hash-min loop
(graph/components.hash_min_cc — the exact code the batch key runs)
re-converges. Correctness is structural: CC(star-contraction(G₁) ∪ E₂)
= CC(G₁ ∪ E₂), so after the last batch the labels equal the batch
answer on the full edge set — which is why this key reuses the batch
key's EXACT unrolled hash-min DuckDB oracle verbatim.

Scale posture: per-batch work is O(|state| + |batch|), not O(|edge
log|) — the whole point of incremental maintenance; the prior state is
a depth-1 star forest, so re-convergence rounds are bounded by the
CHAINING the new batch introduces (≈log of the longest new merge
chain), not the raw graph diameter. State lives as a parquet label
frame per version (the foreachBatch CDC discipline of
``streaming/cdc.py``), partitioned on v — at 1000 executors both the
state scan and the union shuffle on the same vertex key. Replay chunks
are SHIP-DATE range-ordered (the replay.py mtime discipline), so edges
arrive in event-time order like a real edge stream; CC is
arrival-order-invariant, so batching never changes the fixpoint.
"""

from __future__ import annotations

import glob
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.components import (
    ORACLE as _BATCH_ORACLE,
    hash_min_cc,
)
from flink_streaming_gnn_spark.graph.edges import derive_edges

N_CHUNKS = 8
FILES_PER_TRIGGER = 2  # -> 4 micro-batches over the fixture


def edges_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded-source view of the DERIVED edge table: the lineitem ⋈
    orders edge events re-chunked into ship-date-ordered parquet ranges,
    built once per process from the fixture and gone at exit (the
    events_stream discipline, replay.py / sources/scratch.py)."""
    from flink_streaming_gnn_spark.sources.scratch import (
        fixture_fingerprint,
        scratch_dir,
    )

    def _build(staging: str) -> None:
        (
            derive_edges(spark, sf_dir)
            .select("src", "dst", "ts")
            .repartitionByRange(N_CHUNKS, "ts", "src", "dst")
            .sortWithinPartitions("ts", "src", "dst")
            .write.mode("overwrite")
            .parquet(staging)
        )
        base = int(time.time())
        for i, p in enumerate(sorted(glob.glob(os.path.join(staging, "part-*")))):
            os.utime(p, (base + i, base + i))

    chunk_dir = scratch_dir(
        "edge_chunks",
        "v1-edgechunks:"
        + fixture_fingerprint(os.path.join(sf_dir, "lineitem.parquet")),
        _build,
    )
    return (
        spark.readStream.schema("src long, dst long, ts timestamp_ntz")
        .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
        .parquet(chunk_dir)
    )


def merge_batch(prior_labels: DataFrame | None, batch_und: DataFrame) -> DataFrame:
    """One incremental step: hash-min CC over (star-contraction of the
    prior labels ∪ the new undirected batch edges). Pure — the unit the
    cross-batch merge test drives on synthetic chains."""
    und = batch_und
    if prior_labels is not None:
        prior = prior_labels.select(F.col("v").alias("a"), F.col("lbl").alias("b"))
        und = und.union(prior).union(
            prior.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
    return hash_min_cc(und)


def stream_cc_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained component labels over the streamed edge
    events; returns the per-component summary of the FINAL state — equal
    to the batch ``graph_connected_components`` answer by construction
    (module docstring), so the batch key's exact oracle applies."""
    import uuid

    state_root = os.path.join(
        tempfile.gettempdir(), f"cc_state_{uuid.uuid4().hex[:8]}"
    )
    os.makedirs(state_root, exist_ok=True)
    state = {"path": None}

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        b = (
            batch_df.select(
                (F.col("src") * 2).alias("a"), (F.col("dst") * 2 + 1).alias("b")
            )
            .distinct()
        )
        und = b.union(b.select(F.col("b").alias("a"), F.col("a").alias("b")))
        # star edges both ways; root self-loops keep isolated-rooted
        # vertices alive in the endpoint-derived init set
        prior = (
            spark.read.parquet(state["path"])
            if state["path"] is not None
            else None
        )
        labels = merge_batch(prior, und)
        out = os.path.join(state_root, f"v{batch_id}")
        labels.write.mode("overwrite").parquet(out)
        state["path"] = out

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            edges_stream(spark, sf_dir)
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # The last micro-batch's final hash_min_cc labels frame (a
    # localCheckpoint — block-manager heap) is unreferenced once the
    # drain ends but its py4j proxy sits in a reference cycle; collect it
    # here so the key leaves no |V|-sized residue in a long-lived JVM
    # (see graph/components.hash_min_cc for the measured numbers).
    import gc

    gc.collect()

    labels = spark.read.parquet(state["path"])
    return (
        labels.groupBy("lbl")
        .agg(
            F.count("*").cast("long").alias("n_vertices"),
            F.sum(((F.col("v") % 2) == 0).cast("long")).cast("long").alias(
                "n_customers"
            ),
            F.sum(((F.col("v") % 2) == 1).cast("long")).cast("long").alias(
                "n_suppliers"
            ),
        )
        .select(
            F.col("lbl").cast("long").alias("component"),
            "n_vertices",
            "n_customers",
            "n_suppliers",
        )
        .orderBy("component")
    )


QUERIES = {"stream_cc_e2e": stream_cc_e2e}
# final incremental state == batch CC on the full edge set — the batch
# key's exact unrolled hash-min oracle applies verbatim
ORACLE = {"stream_cc_e2e": _BATCH_ORACLE["graph_connected_components"]}
