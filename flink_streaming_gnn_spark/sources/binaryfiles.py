"""Opaque-binary-asset ingestion via Spark's ``binaryFile`` data source
(SURVEY.md §2A A1 / north-star multimodal tier): the production path for
reading image/audio/video blobs into a DataFrame is
``spark.read.format("binaryFile")`` — one row per file with (path,
modificationTime, length, content: binary) — and this key proves that
path end-to-end: a bounded set of documents is materialized as one
``.bin`` file each, ingested back through binaryFile, and checksummed.

The oracle recomputes byte length and md5 from the source table's text
(the fixture corpus is pure printable ASCII, so UTF-8 bytes == the
string DuckDB hashes) — the hash match proves the binary content
survived the file round-trip bit-for-bit, which is exactly the property
a multimodal pipeline needs from its blob ingest.

Scale posture: binaryFile is a real DataSource V2 scan — file listing is
distributed, each file is one task input (non-splittable by design —
blobs are whole objects), and ``pathGlobFilter``/partitioned directories
prune at the listing level. The bounded fan-out here (N_FILES files,
driver-side write) is fixture geometry, not the operator: at 100 TB the
same reader scans an object-store prefix with millions of blobs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table, table_path

N_FILES = 200


def _blob_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize documents doc_id < N_FILES as one .bin file each —
    per-process scratch input (the ``sources/scratch.py`` discipline)."""
    from flink_streaming_gnn_spark.sources.scratch import (
        fixture_fingerprint,
        scratch_dir,
    )

    def _build(staging: str) -> None:
        rows = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < N_FILES)
            .select("doc_id", "text")
            .collect()  # bounded: ≤ N_FILES rows by construction
        )
        for r in rows:
            with open(os.path.join(staging, f"{r.doc_id:08d}.bin"), "wb") as f:
                f.write(r.text.encode("utf-8"))

    return scratch_dir(
        "docs_bin",
        f"bin{N_FILES}:" + fixture_fingerprint(table_path(sf_dir, "documents")),
        _build,
    )


def source_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _blob_dir(spark, sf_dir)
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
        .select(
            F.regexp_extract(
                F.element_at(F.split("path", "/"), -1), r"^(\d+)\.bin$", 1
            )
            .cast("long")
            .alias("doc_id"),
            F.col("length").alias("n_bytes"),
            F.md5("content").alias("content_md5"),
        )
        .orderBy("doc_id")
    )


QUERIES = {"source_binaryfile_ingest": source_binaryfile_ingest}

ORACLE = {
    "source_binaryfile_ingest": f"""
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               md5(text) AS content_md5
        FROM documents
        WHERE doc_id < {N_FILES}
        ORDER BY doc_id
    """,
}
