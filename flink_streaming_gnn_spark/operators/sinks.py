"""Sink surface (SURVEY.md §2B "Scans / sources / sinks": sink_parquet).

The round-trip query proves the write path end-to-end with a full oracle
hash: an aggregate result is written as partitioned parquet, read back,
and must hash-match the DuckDB twin of the *original* query — covering
writer, committer, partition layout, and schema fidelity in one check.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table


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
    out_dir = os.path.join(
        tempfile.gettempdir(), f"sink_roundtrip_{os.path.basename(sf_dir.rstrip('/'))}"
    )
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
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"docs_bylang_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    if not os.path.isdir(out_dir):
        d.write.mode("overwrite").partitionBy("lang").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    langs = [r.lang for r in d.select("lang").distinct().collect()]
    target = sorted(langs)[0]  # deterministic: lexicographically first lang
    return back.filter(F.col("lang") == target).select(
        "doc_id", "text", F.col("lang").cast("string").alias("lang"), "source", "n_chars"
    )


QUERIES = {
    "sink_parquet": sink_parquet_roundtrip,
    "scan_partition_pruning": scan_partition_pruning,
}

ORACLE = {
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
