"""Hidden file-metadata columns (SURVEY.md §2B scans family): Spark's
``_metadata`` struct (Spark 3.4+) exposes per-row provenance —
file name, size, row position — without any UDF or input_file_name()
legacy call. Per-file row counts and key ranges are the lineage/debug
primitive every ingestion pipeline wants ("which file produced these
rows"), and they prune to pure scan-side accounting: no shuffle beyond
the one |files|-sized aggregate.

Oracle: DuckDB's ``read_parquet(..., filename=true)`` is the exact
cross-engine twin; both sides reduce the path to its basename (Spark
reports a file: URI, DuckDB a filesystem path — the basename is the
stable common denominator).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import table_path


def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(table_path(sf_dir, "lineitem"))
    return (
        li.select(
            F.col("_metadata.file_name").alias("file_name"), "l_orderkey"
        )
        .groupBy("file_name")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("l_orderkey").cast("long").alias("min_orderkey"),
            F.max("l_orderkey").cast("long").alias("max_orderkey"),
        )
        .orderBy("file_name")
    )


def _metadata_oracle_sql(sf_dir: str | None = None) -> str:
    # Follow the SAME fixture-dir override the test harness uses
    # (tests/conftest.py SF_ORACLE) so running the differential at any
    # other sf dir compares Spark output against the right files.
    if sf_dir is None:
        sf_dir = os.environ.get(
            "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01"
        )
    # the driver registers `lineitem` as a view without filename info, so
    # the oracle reads the parquet directly (same fixture path contract
    # the driver uses for the views)
    path = os.path.join(sf_dir, "lineitem.parquet")
    return f"""
        SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(l_orderkey) AS BIGINT) AS min_orderkey,
               CAST(max(l_orderkey) AS BIGINT) AS max_orderkey
        FROM read_parquet('{path}', filename=true)
        GROUP BY 1
        ORDER BY 1
    """


QUERIES = {"scan_file_metadata": scan_file_metadata}
ORACLE = {"scan_file_metadata": _metadata_oracle_sql()}
