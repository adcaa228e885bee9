"""Text-format sources (SURVEY.md §2A A1 "file line" ingestion): CSV and
JSON-lines readers with explicit schemas, proven by write→read round-trips
whose oracle is the original parquet table — format parity, not just
"it parses".

Scale posture: both readers are splittable scans (CSV/JSONL split on line
boundaries), schema is always explicit (schema inference is a full extra
pass at 100 TB — never rely on it), and malformed rows follow the
PERMISSIVE default with a `_corrupt_record` column in production configs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_streaming_gnn_spark.sources.scratch import (
    fixture_fingerprint,
    scratch_dir,
)
from flink_streaming_gnn_spark.sources.tables import load_table, table_path

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _roundtrip_dir(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Write the documents table once PER PROCESS as ``fmt``
    (csv/json/orc) — a derived scratch input that dies with the process
    (sources/scratch.py)."""

    def _build(staging: str) -> None:
        writer = (
            load_table(spark, sf_dir, "documents").coalesce(1).write.mode("overwrite")
        )
        if fmt == "csv":
            writer.option("header", "true").option("quoteAll", "true").csv(staging)
        elif fmt == "orc":
            writer.orc(staging)
        else:
            writer.json(staging)

    return scratch_dir(
        f"docs_{fmt}",
        fixture_fingerprint(table_path(sf_dir, "documents")),
        _build,
    )


def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → CSV (quoted, headered) → explicit-schema CSV scan; the
    oracle compares against the original parquet table, so quoting of the
    free-text column is covered too."""
    path = _roundtrip_dir(spark, sf_dir, "csv")
    return (
        spark.read.schema(DOCS_SCHEMA)
        .option("header", "true")
        .csv(path)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → JSON-lines → explicit-schema JSON scan (no inference)."""
    path = _roundtrip_dir(spark, sf_dir, "json")
    return (
        spark.read.schema(DOCS_SCHEMA)
        .json(path)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → ORC → ORC scan (the other columnar format Spark ships
    natively; same pushdown/pruning machinery as parquet)."""
    path = _roundtrip_dir(spark, sf_dir, "orc")
    return spark.read.orc(path).select("doc_id", "text", "lang", "source", "n_chars")


CORRUPT_MOD = 7  # rows with doc_id % CORRUPT_MOD == 0 are mangled


def _corrupt_jsonl_dir(spark: SparkSession, sf_dir: str) -> str:
    """JSONL copy of documents with a deterministic fraction of rows
    mangled (truncated mid-object + junk suffix) — per-process scratch
    like the clean round-trip dirs."""

    def _build(staging: str) -> None:
        from pyspark.sql import functions as F

        js = F.to_json(F.struct("doc_id", "text", "lang", "source", "n_chars"))
        lines = load_table(spark, sf_dir, "documents").select(
            F.when(
                F.col("doc_id") % CORRUPT_MOD == 0,
                F.concat(F.substring(js, 1, 25), F.lit("@@not-json")),
            )
            .otherwise(js)
            .alias("value")
        )
        lines.coalesce(1).write.mode("overwrite").text(staging)

    return scratch_dir(
        f"docs_corrupt{CORRUPT_MOD}",
        fixture_fingerprint(table_path(sf_dir, "documents")),
        _build,
    )


def source_jsonl_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bad-record handling on ingest — the PERMISSIVE path every
    production crawler feed needs: malformed lines land whole in
    ``_corrupt_record`` (all data columns null) instead of failing the
    job or being silently dropped. The key reduces the scan to per-lang
    valid counts plus a ``_corrupt_`` bucket; the oracle recomputes the
    same buckets from the clean table and the deterministic corruption
    rule, so the hash proves the parser recovered EXACTLY the uncorrupted
    rows and quarantined EXACTLY the mangled ones."""
    from pyspark.sql import functions as F

    path = _corrupt_jsonl_dir(spark, sf_dir)
    df = (
        spark.read.schema(DOCS_SCHEMA + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    bucket = F.when(
        F.col("_corrupt_record").isNotNull(), F.lit("_corrupt_")
    ).otherwise(F.col("lang"))
    return (
        df.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("bucket")
    )


QUERIES = {
    "source_csv_roundtrip": source_csv_roundtrip,
    "source_jsonl_roundtrip": source_jsonl_roundtrip,
    "source_orc_roundtrip": source_orc_roundtrip,
    "source_jsonl_corrupt_records": source_jsonl_corrupt_records,
}

_DOCS_SQL = "SELECT doc_id, text, lang, source, n_chars FROM documents"

ORACLE = {
    "source_csv_roundtrip": _DOCS_SQL,
    "source_jsonl_roundtrip": _DOCS_SQL,
    "source_orc_roundtrip": _DOCS_SQL,
    "source_jsonl_corrupt_records": f"""
        SELECT CASE WHEN doc_id % {CORRUPT_MOD} = 0 THEN '_corrupt_' ELSE lang END
                   AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM documents
        GROUP BY 1
        ORDER BY 1
    """,
}
