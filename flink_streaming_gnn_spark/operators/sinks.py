"""Sink surface (SURVEY.md §2B "Scans / sources / sinks": sink_parquet).

The round-trip query proves the write path end-to-end with a full oracle
hash: an aggregate result is written as partitioned parquet, read back,
and must hash-match the DuckDB twin of the *original* query — covering
writer, committer, partition layout, and schema fidelity in one check.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.scratch import (
    ephemeral_dir,
    fixture_fingerprint,
    scratch_dir,
)
from flink_streaming_gnn_spark.sources.tables import load_table, table_path


def sink_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a per-(returnflag, linestatus) aggregate as parquet partitioned
    by l_returnflag (the at-scale layout: partition column = coarse key,
    files pruned on read), then read it back. Hash-checked against the
    DuckDB twin of the aggregation itself — a write that loses or mangles
    rows cannot pass."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )
    out_dir = ephemeral_dir("sink_roundtrip")
    agg.write.mode("overwrite").partitionBy("l_returnflag").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    # partition column comes back last and typed as read; restore order/type
    return back.select(
        F.col("l_returnflag").cast("string").alias("l_returnflag"),
        "l_linestatus",
        "n_rows",
        "sum_qty",
    )


def scan_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition pruning end-to-end: documents written hive-partitioned by
    lang, read back with a lang predicate — at 100 TB this is the
    difference between scanning one directory and scanning the corpus.
    The plan must show ``PartitionFilters`` (asserted in
    tools/explain_audit.py); the oracle is the same predicate on the
    unpartitioned table, so a pruning bug that drops or duplicates
    partitions cannot hash-match."""
    d = load_table(spark, sf_dir, "documents")
    # per-process scratch layout (round 10: was reused across runs keyed
    # on the fixture's basename alone — cross-run reuse, and a stale-read
    # hazard for regenerated fixtures)
    out_dir = scratch_dir(
        "docs_bylang",
        fixture_fingerprint(table_path(sf_dir, "documents")),
        lambda staging: d.write.mode("overwrite").partitionBy("lang").parquet(staging),
    )
    back = spark.read.parquet(out_dir)
    langs = [r.lang for r in d.select("lang").distinct().collect()]
    target = sorted(langs)[0]  # deterministic: lexicographically first lang
    return back.filter(F.col("lang") == target).select(
        "doc_id", "text", F.col("lang").cast("string").alias("lang"), "source", "n_chars"
    )


def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance operation every
    100 TB lake needs (streaming sinks and fine-grained partitions leave
    thousands of KB-sized files; scan cost is then dominated by file
    listing and open overhead, not bytes). Deliberately fragment events
    into 64 splinter files, compact by rewriting with a byte-budget
    repartition (here to 4 files ≈ the classic 128 MB-target rewrite),
    and read the compacted table back. The oracle is the ORIGINAL table,
    so a compaction that loses, duplicates, or mangles any row cannot
    hash-match; the file counts are asserted so the key proves compaction
    actually happened."""
    ev = load_table(spark, sf_dir, "events")
    frag_dir = ephemeral_dir("events_frag")
    compact_dir = ephemeral_dir("events_compact")
    ev.repartition(64).write.mode("overwrite").parquet(frag_dir)
    frag = spark.read.parquet(frag_dir)
    frag.repartition(4).write.mode("overwrite").parquet(compact_dir)

    def _n_files(d: str) -> int:
        return len([f for f in os.listdir(d) if f.endswith(".parquet")])

    if not _n_files(frag_dir) > _n_files(compact_dir):
        raise AssertionError("compaction did not reduce file count")
    back = spark.read.parquet(compact_dir)
    return back.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "user_id",
        "event_type",
        "value",
    )


def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read (mergeSchema): generation 1 of a dataset
    is written without a column, generation 2 adds it; a merged scan must
    surface the union schema with NULLs for the missing column — the
    add-a-column migration every long-lived lake table goes through
    without rewriting history. Split = deterministic id parity; oracle =
    the same UNION ALL with a NULL literal."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    out = ephemeral_dir("events_evolved")
    gen1 = ev.filter(F.pmod("event_id", F.lit(2)) == 0).drop("value")
    gen2 = ev.filter(F.pmod("event_id", F.lit(2)) == 1)
    gen1.write.mode("overwrite").parquet(os.path.join(out, "gen=1"))
    gen2.write.mode("overwrite").parquet(os.path.join(out, "gen=2"))
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "gen=1"), os.path.join(out, "gen=2")
    )
    return back.select("event_id", "user_id", "event_type", "value")


QUERIES = {
    "sink_compact_small_files": sink_compact_small_files,
    "scan_schema_evolution": scan_schema_evolution,
    "sink_parquet": sink_parquet_roundtrip,
    "scan_partition_pruning": scan_partition_pruning,
}

ORACLE = {
    "sink_compact_small_files": """
        SELECT event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
               user_id, event_type, value
        FROM events
    """,
    "scan_schema_evolution": """
        SELECT event_id, user_id, event_type, CAST(NULL AS DOUBLE) AS value
        FROM events WHERE event_id % 2 = 0
        UNION ALL
        SELECT event_id, user_id, event_type, value
        FROM events WHERE event_id % 2 = 1
    """,
    "scan_partition_pruning": """
        SELECT doc_id, text, lang, source, n_chars
        FROM documents
        WHERE lang = (SELECT min(lang) FROM documents)
    """,
    "sink_parquet": """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
}
