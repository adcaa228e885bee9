"""String function family (SURVEY.md §2B fn_string).

Regex note: Spark uses Java regex, DuckDB uses RE2 — oracle twins stick to
the common dialect subset (character classes, groups, quantifiers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table


def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("-", "c_name", "c_mktsegment").alias("name_seg"),
        F.length("c_name").cast("long").alias("name_len"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("name_masked"),
        F.nullif(F.regexp_extract("c_name", "([0-9]+)", 1), F.lit("")).alias("name_digits"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.col("c_name").like("%1%").alias("has_one"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_lowered_vowels"),
    )


QUERIES = {"fn_string": fn_string}

ORACLE = {
    "fn_string": """
        SELECT c_custkey,
               lower(c_name) AS name_lower,
               upper(c_mktsegment) AS seg_upper,
               trim('  pad  ') AS trimmed,
               substr(c_name, 1, 8) AS name_prefix,
               c_name || '-' || c_mktsegment AS name_seg,
               CAST(length(c_name) AS BIGINT) AS name_len,
               regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
               nullif(regexp_extract(c_name, '([0-9]+)', 1), '') AS name_digits,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
               c_name LIKE '%1%' AS has_one,
               translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lowered_vowels
        FROM customer
    """,
}
