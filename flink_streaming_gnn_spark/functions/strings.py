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


def fn_regexp_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-regex family over document text: extract-all (joined to one
    string for a representation-stable oracle), match count, rlike, and
    split-by-pattern length — all JVM regexp, map-only."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        # coalesce: DuckDB's array_to_string on an empty list yields NULL,
        # Spark's array_join yields '' — pin '' on both sides
        F.coalesce(
            F.array_join(
                F.regexp_extract_all("text", F.lit("(\\b[a-z]{4}\\b)"), 1), ","
            ),
            F.lit(""),
        ).alias("four_letter_words"),
        F.regexp_count("text", F.lit("\\bthe\\b")).cast("long").alias("n_the"),
        F.col("text").rlike("join.*window|window.*join").alias("has_join_window"),
        F.size(F.split("text", "\\s+")).cast("long").alias("n_ws_tokens"),
    )


def fn_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation-aware grouping (the VARIANT-generation SQL
    surface): a deterministically mixed-cased copy of event_type
    (initcap / UPPER / raw by event_id residue) grouped under the
    UTF8_LCASE collation — the engine groups case-insensitively WITHOUT
    rewriting the data through lower(). Output is made deterministic by
    reducing each group to its binary-min variant; the oracle expresses
    the same semantics as GROUP BY lower(s) (collation is exactly
    lower-normalization for this ASCII domain)."""
    ev = load_table(spark, sf_dir, "events")
    mixed = (
        F.when(F.col("event_id") % 3 == 0, F.upper("event_type"))
        .when(F.col("event_id") % 3 == 1, F.initcap("event_type"))
        .otherwise(F.col("event_type"))
    )
    return (
        ev.select(mixed.alias("s"))
        .groupBy(F.collate("s", "UTF8_LCASE").alias("k"))
        .agg(
            F.min(F.col("s").cast("string")).alias("min_variant"),
            F.count("*").cast("long").alias("n"),
        )
        .select(
            F.lower("k").cast("string").alias("k_lower"), "min_variant", "n"
        )
        .orderBy("k_lower")
    )


QUERIES = {
    "fn_string": fn_string,
    "fn_regexp_family": fn_regexp_family,
    "fn_collation_group": fn_collation_group,
}

ORACLE = {
    "fn_collation_group": """
        WITH mixed AS (
            -- faithful initcap twin: Spark initcap capitalizes the first
            -- letter of EVERY whitespace-delimited word (not just the
            -- string head), so the oracle maps the same per-word transform
            -- over a space split rather than capitalizing only char 1
            SELECT CASE
                       WHEN event_id % 3 = 0 THEN upper(event_type)
                       WHEN event_id % 3 = 1
                           THEN array_to_string(
                                    list_transform(
                                        string_split(event_type, ' '),
                                        w -> upper(substr(w, 1, 1))
                                             || lower(substr(w, 2))
                                    ),
                                    ' '
                                )
                       ELSE event_type
                   END AS s
            FROM events
        )
        SELECT lower(s) AS k_lower,
               min(s) AS min_variant,
               CAST(count(*) AS BIGINT) AS n
        FROM mixed
        GROUP BY lower(s)
        ORDER BY lower(s)
    """,
    "fn_regexp_family": r"""
        SELECT doc_id,
               COALESCE(array_to_string(regexp_extract_all(text, '(\b[a-z]{4}\b)', 1), ','), '')
                   AS four_letter_words,
               CAST(len(regexp_extract_all(text, '\bthe\b')) AS BIGINT) AS n_the,
               regexp_matches(text, 'join.*window|window.*join')
                   AS has_join_window,
               CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_ws_tokens
        FROM documents
    """,
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
