"""Spark 4 VARIANT semi-structured path (SURVEY.md §2B scalar-fn family,
extending ``fn_json``): ingest JSON into the binary VARIANT type and
extract typed paths with ``variant_get`` — the modern lakehouse answer to
schema-on-read JSON columns (shredded binary encoding, no per-row text
re-parse after ingest).

``fn_variant_json`` builds a nested envelope from the event row
(``{"et": <event_type>, "meta": <props>}``), parses it ONCE into VARIANT,
then extracts two typed paths and aggregates. At 100 TB the parse is a
map-only projection riding the scan (VARIANT binary is then cheaper to
re-extract than JSON text), and the aggregate shuffles |event_type| groups
— scale-invariant output. The DuckDB oracle runs ``json_extract`` over
the identical envelope string, pinning path semantics across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table


def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    envelope = F.concat(
        F.lit('{"et":"'), F.col("event_type"), F.lit('","meta":'), F.col("props"),
        F.lit("}"),
    )
    v = ev.select(F.parse_json(envelope).alias("v"))
    extracted = v.select(
        F.variant_get("v", "$.et", "string").alias("et"),
        F.variant_get("v", "$.meta.k", "bigint").alias("k"),
    )
    return extracted.groupBy("et").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("k").cast("long").alias("sum_k"),
        F.max("k").cast("long").alias("max_k"),
        F.count_distinct("k").cast("long").alias("n_distinct_k"),
    )


QUERIES = {"fn_variant_json": fn_variant_json}

ORACLE = {
    "fn_variant_json": """
        WITH env AS (
            SELECT '{"et":"' || event_type || '","meta":' || props || '}' AS j
            FROM events
        ),
        extracted AS (
            SELECT json_extract_string(j, '$.et') AS et,
                   CAST(json_extract(j, '$.meta.k') AS BIGINT) AS k
            FROM env
        )
        SELECT et,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(k) AS BIGINT) AS sum_k,
               CAST(max(k) AS BIGINT) AS max_k,
               CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
        FROM extracted
        GROUP BY et
    """,
}
