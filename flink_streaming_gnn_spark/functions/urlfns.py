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


def fn_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the dedup-key normalization every web
    pipeline runs before exact URL dedup: lowercase the host, strip the
    default :443 port, drop tracking (utm_*) parameters, SORT the
    remaining query parameters, drop the fragment, strip the trailing
    path slash. The query constructs a deliberately messy URL (uppercase
    scheme/host, default port, utm noise, unsorted params, fragment) and
    normalizes it with array higher-order functions (split → filter →
    array_sort → join) — map-only codegen, no shuffle. The oracle
    performs the same normalization with DuckDB's independent list
    functions (list_filter/list_sort), so the check compares two
    implementations of the spec, not a builder against itself."""
    d = load_table(spark, sf_dir, "documents")
    messy = F.concat_ws(
        "",
        F.lit("HTTPS://"),
        F.upper("source"),
        F.lit(".Example.COM:443/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("/?utm_source=feed&n="),
        F.col("n_chars").cast("string"),
        F.lit("&lang="),
        F.col("lang"),
        F.lit("&utm_campaign=x#frag"),
    )
    u = d.select("doc_id", messy.alias("url"))
    host = F.regexp_replace(
        F.lower(F.regexp_extract("url", r"^[A-Za-z]+://([^/?#]+)", 1)),
        r":443$",
        "",
    )
    path = F.regexp_replace(
        F.regexp_extract("url", r"^[A-Za-z]+://[^/?#]+(/[^?#]*)", 1), r"/$", ""
    )
    params = F.split(F.regexp_extract("url", r"\?([^#]*)", 1), "&")
    kept = F.array_sort(
        F.filter(params, lambda p: ~p.startswith("utm_") & (p != ""))
    )
    return u.select(
        "doc_id",
        "url",
        host.alias("host"),
        F.concat(
            F.lit("https://"), host, path, F.lit("?"), F.array_join(kept, "&")
        ).alias("canonical"),
        F.size(kept).cast("long").alias("n_params"),
    )


def fn_hash_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash surface — md5 + sha256 digests of document text plus
    the 2-hex-char shard prefix (the standard content-addressed dedup /
    sharding key trio). Map-only codegen."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2("text", 256).alias("sha256_hex"),
        F.substring(F.md5("text"), 1, 2).alias("shard"),
    )


QUERIES = {
    "fn_url_parse": fn_url_parse,
    "fn_url_canonicalize": fn_url_canonicalize,
    "fn_hash_digests": fn_hash_digests,
}

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
    "fn_url_canonicalize": """
        WITH u AS (
            SELECT doc_id,
                   'HTTPS://' || upper(source) || '.Example.COM:443/docs/'
                       || CAST(doc_id AS VARCHAR)
                       || '/?utm_source=feed&n=' || CAST(n_chars AS VARCHAR)
                       || '&lang=' || lang || '&utm_campaign=x#frag' AS url
            FROM documents
        ),
        parts AS (
            SELECT doc_id, url,
                   regexp_replace(
                       lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
                       ':443$', '') AS host,
                   regexp_replace(
                       regexp_extract(url, '^[A-Za-z]+://[^/?#]+(/[^?#]*)', 1),
                       '/$', '') AS path,
                   list_sort(list_filter(
                       string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                       p -> NOT starts_with(p, 'utm_') AND p <> '')) AS kept
            FROM u
        )
        SELECT doc_id, url, host,
               'https://' || host || path || '?' || array_to_string(kept, '&')
                   AS canonical,
               CAST(len(kept) AS BIGINT) AS n_params
        FROM parts
    """,
    "fn_hash_digests": """
        SELECT doc_id,
               md5(text) AS md5_hex,
               sha256(text) AS sha256_hex,
               substr(md5(text), 1, 2) AS shard
        FROM documents
    """,
}
