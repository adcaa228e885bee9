"""Corpus-curation text filters beyond the quality/dedup ladder
(SURVEY.md §2B LLM-pipeline rows): PII redaction and intra-document
repetition analysis — two standard gates in a pre-training data funnel
(e.g. the C4/Gopher-style cleaning rules).

* ``text_pii_redact`` — regex scrubbing of emails/phone patterns. The
  corpus fixture is synthetic word salad with no PII, so the query first
  *plants* deterministic PII (an email derived from doc_id on every doc, a
  phone number on odd docs) and then proves the scrubber removes exactly
  what was planted. All JVM regexp_replace/regexp_count — codegen'd, no
  Python; at 100 TB this is a map-only pass with zero shuffle.

* ``text_repetition_stats`` — per-document token repetition profile
  (total/distinct tokens, top-token share, repetition ratio): the Gopher
  repetition signals as one explode + two hash aggregates keyed on doc_id,
  so the shuffle carries (doc_id, token) counts, never raw text twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "[0-9]{3}-[0-9]{4}"


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.lit("contact user"),
            F.col("doc_id"),
            F.lit("@mail.example.com "),
            F.when(F.col("doc_id") % 2 == 1, F.lit("tel 555-0199 ")).otherwise(
                F.lit("")
            ),
            F.col("text"),
        ).alias("raw"),
    )
    red = F.regexp_replace(
        F.regexp_replace(F.col("raw"), EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return planted.select(
        "doc_id",
        F.substring(red, 1, 80).alias("redacted_prefix"),
        (
            F.regexp_count(F.col("raw"), F.lit(EMAIL_RE))
            + F.regexp_count(F.col("raw"), F.lit(PHONE_RE))
        )
        .cast("long")
        .alias("n_pii"),
    )


def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tokens = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    per_tok = tokens.groupBy("doc_id", "tok").agg(F.count("*").alias("cnt"))
    return per_tok.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
        F.max("cnt").cast("long").alias("top_count"),
        F.round(F.max("cnt") / F.sum("cnt"), 4).alias("top_share"),
        F.round(F.lit(1.0) - F.count("*") / F.sum("cnt"), 4).alias("repetition_ratio"),
    )


QUERIES = {
    "text_pii_redact": text_pii_redact,
    "text_repetition_stats": text_repetition_stats,
}

ORACLE = {
    "text_pii_redact": f"""
        WITH planted AS (
            SELECT doc_id,
                   'contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com '
                   || CASE WHEN doc_id % 2 = 1 THEN 'tel 555-0199 ' ELSE '' END
                   || text AS raw
            FROM documents
        )
        SELECT doc_id,
               substring(
                   regexp_replace(
                       regexp_replace(raw, '{EMAIL_RE}', '<EMAIL>', 'g'),
                       '{PHONE_RE}', '<PHONE>', 'g'),
                   1, 80) AS redacted_prefix,
               CAST(length(regexp_extract_all(raw, '{EMAIL_RE}'))
                    + length(regexp_extract_all(raw, '{PHONE_RE}')) AS BIGINT) AS n_pii
        FROM planted
    """,
    "text_repetition_stats": """
        WITH tokens AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        per_tok AS (
            SELECT doc_id, tok, count(*) AS cnt
            FROM tokens WHERE tok <> '' GROUP BY doc_id, tok
        )
        SELECT doc_id,
               CAST(sum(cnt) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(max(cnt) AS BIGINT) AS top_count,
               round(max(cnt) / CAST(sum(cnt) AS DOUBLE), 4) AS top_share,
               round(1.0 - count(*) / CAST(sum(cnt) AS DOUBLE), 4) AS repetition_ratio
        FROM per_tok GROUP BY doc_id
    """,
}
