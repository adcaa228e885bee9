"""Corpus slicing operators for training-data pipelines (north_star):
deterministic sampling and overlapping document chunking — the two ops
every 100 TB text pipeline runs before anything else.

Both are pure id/position functions: no rand(), no driver state, so any
worker at any parallelism produces the same output (the same stream-safety
argument as the A3 splitter) and both are fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

SAMPLE_PCT = 10  # keep doc_id % 100 < 10 — exact 10%-ish deterministic sample
CHUNK_TOKENS = 40
CHUNK_STRIDE = 30  # 10-token overlap between consecutive chunks


def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible corpus sample: keep rows whose id lands in the selected
    residue band. Unlike ``df.sample()`` (per-partition RNG — changes with
    repartitioning), the output is a pure function of the data, per the
    splitter discipline. A band on ``xxhash64(id)`` decorrelates from id
    patterns at scale; plain ``id % 100`` keeps the oracle engine-neutral."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.pmod("doc_id", F.lit(100)) < SAMPLE_PCT).select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )


def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking: 40-token chunks every 30 tokens
    (documents shorter than one window yield a single short chunk). One
    projection + one explode — no shuffle at all; chunk text is
    re-assembled JVM-side with array slice + concat."""
    d = load_table(spark, sf_dir, "documents").withColumn("toks", F.split("text", " "))
    n_chunks = F.greatest(
        F.ceil((F.size("toks") - F.lit(CHUNK_TOKENS)) / F.lit(CHUNK_STRIDE)) + 1,
        F.lit(1),
    )
    chunks = d.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        "toks",
    )
    start = (F.col("chunk_id") * CHUNK_STRIDE + 1).cast("int")  # 1-based slice
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(" ", F.slice("toks", start, CHUNK_TOKENS)).alias("chunk_text"),
        F.least(F.lit(CHUNK_TOKENS), F.col("n_toks") - start + 1)
        .cast("long")
        .alias("chunk_len"),
    )


QUERIES = {
    "sample_deterministic": sample_deterministic,
    "text_chunk": text_chunk,
}

ORACLE = {
    "sample_deterministic": f"""
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents
        WHERE doc_id % 100 < {SAMPLE_PCT}
    """,
    "text_chunk": f"""
        WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n_toks
            FROM documents
        ),
        chunked AS (
            SELECT doc_id, n_toks, toks,
                   unnest(generate_series(0,
                       CAST(greatest(ceil((n_toks - {CHUNK_TOKENS}) * 1.0
                                          / {CHUNK_STRIDE}) + 1, 1) AS BIGINT) - 1))
                       AS chunk_id
            FROM base
        )
        SELECT doc_id,
               CAST(chunk_id AS BIGINT) AS chunk_id,
               array_to_string(toks[chunk_id * {CHUNK_STRIDE} + 1 :
                                    chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ')
                   AS chunk_text,
               CAST(least({CHUNK_TOKENS},
                          n_toks - (chunk_id * {CHUNK_STRIDE} + 1) + 1) AS BIGINT)
                   AS chunk_len
        FROM chunked
    """,
}
