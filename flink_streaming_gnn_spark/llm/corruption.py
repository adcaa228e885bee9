"""Denoising-objective span selection (T5/UL2-style span corruption —
the mask-generation step of a pretraining-data pipeline, downstream of
the packing/mixing keys in ``llm/pipeline.py``).

``text_span_corruption`` selects deterministic non-overlapping 3-token
spans: a span starts at 1-based position p iff ``p % 10 == doc_id % 10``
(structurally non-overlapping — starts are 10 apart, spans are 3 long —
and decorrelated across documents by the doc_id phase). Output is the
span table (doc_id, span_start, span_text) a masking writer consumes.

Spark-first: ``sequence`` + ``explode`` over candidate starts, ``slice``
+ ``concat_ws`` for the span text — zero shuffle, pure JVM, the same
partitioning-invariant hash-arithmetic discipline as
``sample_deterministic``. At 100 TB this runs at scan speed; the ~30%
token-mask budget is tuned by the start-stride constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

SPAN_LEN = 3
STRIDE = 10


def text_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= SPAN_LEN)
    )
    starts = d.select(
        "doc_id",
        "toks",
        F.explode(
            F.filter(
                F.sequence(F.lit(1), F.size("toks") - (SPAN_LEN - 1)),
                lambda p: p % STRIDE == F.col("doc_id") % STRIDE,
            )
        ).alias("span_start"),
    )
    return starts.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.concat_ws(" ", F.slice("toks", F.col("span_start"), SPAN_LEN)).alias(
            "span_text"
        ),
    )


QUERIES = {"text_span_corruption": text_span_corruption}

ORACLE = {
    "text_span_corruption": f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        starts AS (
            SELECT doc_id, toks, unnest(generate_series(1, len(toks) - {SPAN_LEN - 1})) AS p
            FROM toks WHERE len(toks) >= {SPAN_LEN}
        )
        SELECT doc_id,
               CAST(p AS BIGINT) AS span_start,
               array_to_string(toks[p:p + {SPAN_LEN - 1}], ' ') AS span_text
        FROM starts
        WHERE p % {STRIDE} = doc_id % {STRIDE}
    """,
}
