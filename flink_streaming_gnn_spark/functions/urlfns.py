"""URL parsing surface (SURVEY.md §2B scalar-function family): Spark's
``parse_url`` — host / path / query / single-parameter extraction — the
standard first step of any web-corpus ingestion (canonicalization,
domain-level dedup keys, per-site quality rollups).

The corpus has no URL column, so the query constructs a deterministic
URL per document from in-table fields (source → subdomain under the
IANA-reserved example.com, doc_id → path, lang/n_chars → query params)
and then PARSES it back with the engine's URL functions. The oracle
builds the identical string and extracts the same components with
regexes — so the check verifies Spark's parse_url semantics (component
boundaries, parameter extraction) against an independent specification
of the grammar, not string-builder against itself. Everything is
whole-stage-codegen string expressions; map-only, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table


def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat_ws(
        "",
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
    )
    return (
        d.select("doc_id", url.alias("url"))
        .select(
            "doc_id",
            "url",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY")).alias("query"),
            F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        )
        .orderBy("doc_id")
    )


QUERIES = {"fn_url_parse": fn_url_parse}

ORACLE = {
    "fn_url_parse": """
        WITH u AS (
            SELECT doc_id,
                   'https://' || source || '.example.com/docs/'
                       || CAST(doc_id AS VARCHAR)
                       || '?lang=' || lang || '&n=' || CAST(n_chars AS VARCHAR)
                       AS url
            FROM documents
        )
        SELECT doc_id, url,
               regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
               regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
               regexp_extract(url, '\\?([^#]*)', 1) AS query,
               regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param
        FROM u
        ORDER BY doc_id
    """,
}
