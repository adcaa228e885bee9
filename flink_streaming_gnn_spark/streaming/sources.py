"""Streaming source builders (SURVEY.md §2A A1: "file line / Kafka topic").

A real deployment's first question is "where does the stream come in".
Spark answers with ``readStream.format(...)`` sources that all yield the
same wire shape, so every downstream plan (windows, stateful ops, the
windowed GNN) is source-agnostic:

- ``kafka_events_stream`` — the production path: ``format("kafka")`` with
  the standard option surface (bootstrap servers, subscribe, offsets).
  There is no broker in this sandbox, so the builder is exercised through
  ``decode_events``'s plan on the file-backed double below; the builder
  itself only composes documented DataSource v2 options.
- ``wire_events_stream`` — the test double: the parquet events fixture
  re-encoded to the exact Kafka wire schema (key/value binary + topic/
  partition/offset/timestamp) and replayed as a file stream. Because both
  sources produce the same columns, ``decode_events`` — and everything
  after it — is byte-for-byte the same plan either way (asserted in
  tests/test_sources.py).

Decode is pure JVM (``from_json`` + casts): no Python in the hot path, and
the JSON parse runs inside whole-stage codegen per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

# the events table's logical schema, as carried inside the Kafka message value
EVENTS_JSON_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)

# columns every Spark Kafka source row carries (the wire contract the test
# double reproduces)
KAFKA_WIRE_COLUMNS = (
    "key",
    "value",
    "topic",
    "partition",
    "offset",
    "timestamp",
    "timestampType",
)


def kafka_events_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
) -> DataFrame:
    """Production events stream from a Kafka topic, decoded to the events
    schema. Partition-parallel by construction: one Spark input partition
    per Kafka topic-partition, so parallelism scales with the topic, and
    ``maxOffsetsPerTrigger`` bounds per-micro-batch intake (backpressure).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return decode_events(reader.load())


def decode_events(wire: DataFrame) -> DataFrame:
    """Kafka wire rows (key/value binary + metadata) → typed events rows.
    Works identically on a real Kafka source, the file-backed double, or a
    batch DataFrame with the same columns (used by the oracle-checked
    round-trip query below)."""
    return wire.select(
        F.from_json(F.col("value").cast("string"), EVENTS_JSON_SCHEMA).alias("e")
    ).select("e.*")


def encode_events_wire(events: DataFrame, topic: str = "events") -> DataFrame:
    """Events rows → Kafka wire shape (the inverse of decode_events; used
    by the test double and by any sink that writes back to Kafka). The key
    is the partitioning identity (user_id) so a keyed topic preserves
    per-user ordering — the same contract the reference's keyBy gave."""
    return events.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct("event_id", "ts", "user_id", "event_type", "value", "props")
        )
        .cast("binary")
        .alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod("user_id", F.lit(8)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).cast("int").alias("timestampType"),
    )


def wire_events_stream(
    spark: SparkSession, sf_dir: str, files_per_trigger: int | None = None
) -> DataFrame:
    """File-backed Kafka double: the events fixture encoded to the wire
    schema and replayed as a multi-file stream (several micro-batches),
    then decoded by the SAME decode_events the production path uses."""
    import hashlib
    import os
    import shutil
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    try:
        stat = os.stat(src)
        fingerprint = f"wire:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}"
    except OSError:
        fingerprint = f"wire:{sf_dir}"
    digest = hashlib.md5(fingerprint.encode()).hexdigest()[:12]
    wire_dir = os.path.join(tempfile.gettempdir(), f"events_wire_{digest}")
    if not os.path.isdir(wire_dir):
        staging = tempfile.mkdtemp(
            prefix=f"events_wire_{digest}_", dir=tempfile.gettempdir()
        )
        encode_events_wire(load_table(spark, sf_dir, "events")).repartition(
            8, "key"
        ).write.mode("overwrite").parquet(staging)
        try:
            os.rename(staging, wire_dir)  # atomic publish
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)
    reader = spark.readStream.schema(
        "key binary, value binary, topic string, partition int, offset long,"
        " timestamp timestamp, timestampType int"
    )
    if files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    return decode_events(reader.parquet(wire_dir))


def source_kafka_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked batch evaluation of the wire codec: events →
    encode_events_wire → decode_events must be the identity on every
    column (the property that makes the Kafka path trustworthy without a
    broker in the sandbox). Timestamps formatted to seconds for a
    stable cross-engine hash."""
    ev = load_table(spark, sf_dir, "events")
    decoded = decode_events(encode_events_wire(ev))
    return decoded.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "user_id",
        "event_type",
        F.round("value", 6).alias("value"),
        "props",
    )


QUERIES = {"source_kafka_roundtrip": source_kafka_roundtrip}

ORACLE = {
    "source_kafka_roundtrip": """
        SELECT event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
               user_id,
               event_type,
               round(value, 6) AS value,
               props
        FROM events
    """,
}
