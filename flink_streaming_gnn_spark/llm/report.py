"""Corpus-level reporting — the two summary views a curation run ends
with (SURVEY.md §2B LLM rows; capstones over the per-doc operators):

* ``multimodal_asset_manifest`` — one row per asset unifying every
  modality plan: text token count, image tile count, audio chunk count,
  video frame-sample count (the deterministic metadata arithmetic of
  ``llm/multimodal.py``), plus the content hash a storage layer keys on.
  Zero shuffle — every column is per-row arithmetic riding one scan.
* ``corpus_stats_report`` — the corpus dashboard as a tall (metric,
  value) table: doc/token totals, mean doc length, language count and
  language-distribution entropy, exact-duplicate rate. TWO aggregate
  passes total (per-lang then global), merged post-aggregation on
  ~|langs| rows.

At 100 TB: the manifest runs at scan speed; the report's shuffles carry
per-language partials only — both are the shapes you can afford to run
after every pipeline stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.llm.multimodal import (
    CHUNK_MS,
    FPS,
    FRAME_SLOTS,
    HOP_MS,
    TILE,
)
from flink_streaming_gnn_spark.sources.tables import load_table


def multimodal_asset_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.select(
        "doc_id",
        F.md5("text").alias("content_hash"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        (
            F.expr(f"(256 + (doc_id % 8) * 128 + {TILE} - 1) div {TILE}")
            * F.expr(f"(256 + (doc_id % 5) * 128 + {TILE} - 1) div {TILE}")
        )
        .cast("long")
        .alias("n_image_tiles"),
        F.expr(
            f"greatest(1, ((5 + doc_id % 120) * 1000 - {CHUNK_MS} + {HOP_MS} - 1)"
            f" div {HOP_MS} + 1)"
        )
        .cast("long")
        .alias("n_audio_chunks"),
        F.lit(FRAME_SLOTS).cast("long").alias("n_video_frames"),
        ((1 + F.pmod("doc_id", F.lit(30))) * FPS).cast("long").alias("n_video_frames_total"),
    )


def corpus_stats_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", F.size(F.split("text", " ")).alias("n_tok")
    )
    per_lang = d.groupBy("lang").agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum("n_tok").cast("double").alias("n_tokens"),
    )
    dups = d.groupBy("text").agg(F.count("*").alias("n_copies"))
    dup_total = dups.agg(
        F.sum(F.col("n_copies") - 1).cast("double").alias("n_dup_docs")
    )
    tot = per_lang.agg(
        F.sum("n_docs").alias("total_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.count("*").cast("double").alias("n_langs"),
    )
    glob = per_lang.crossJoin(F.broadcast(tot)).agg(
        F.first("total_docs").alias("docs"),
        F.first("total_tokens").alias("tokens"),
        F.first("n_langs").alias("n_langs"),
        (
            -F.sum(
                (F.col("n_docs") / F.col("total_docs"))
                * F.log(F.col("n_docs") / F.col("total_docs"))
            )
        ).alias("lang_entropy"),
    )
    wide = glob.crossJoin(F.broadcast(dup_total)).select(
        F.col("docs").alias("n_docs"),
        F.col("tokens").alias("n_tokens"),
        F.round(F.col("tokens") / F.col("docs"), 4).alias("mean_doc_tokens"),
        F.col("n_langs"),
        F.round("lang_entropy", 6).alias("lang_entropy"),
        F.round(F.col("n_dup_docs") / F.col("docs"), 6).alias("exact_dup_rate"),
    )
    return wide.unpivot(
        ids=[], values=list(wide.columns),
        variableColumnName="metric", valueColumnName="value",
    )


QUERIES = {
    "multimodal_asset_manifest": multimodal_asset_manifest,
    "corpus_stats_report": corpus_stats_report,
}

ORACLE = {
    "multimodal_asset_manifest": f"""
        SELECT doc_id,
               md5(text) AS content_hash,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(((256 + (doc_id % 8) * 128 + {TILE} - 1) // {TILE})
                    * ((256 + (doc_id % 5) * 128 + {TILE} - 1) // {TILE})
                    AS BIGINT) AS n_image_tiles,
               CAST(greatest(1, ((5 + doc_id % 120) * 1000 - {CHUNK_MS} + {HOP_MS} - 1)
                                // {HOP_MS} + 1) AS BIGINT) AS n_audio_chunks,
               CAST({FRAME_SLOTS} AS BIGINT) AS n_video_frames,
               CAST((1 + doc_id % 30) * {FPS} AS BIGINT) AS n_video_frames_total
        FROM documents
    """,
    "corpus_stats_report": """
        WITH d AS (
            SELECT doc_id, lang, text,
                   len(string_split(text, ' ')) AS n_tok
            FROM documents
        ),
        per_lang AS (
            SELECT lang, CAST(count(*) AS DOUBLE) AS n_docs,
                   CAST(sum(n_tok) AS DOUBLE) AS n_tokens
            FROM d GROUP BY lang
        ),
        dups AS (
            SELECT CAST(sum(n_copies - 1) AS DOUBLE) AS n_dup_docs
            FROM (SELECT count(*) AS n_copies FROM d GROUP BY text)
        ),
        tot AS (SELECT sum(n_docs) AS total_docs FROM per_lang),
        wide AS (
            SELECT sum(n_docs) AS n_docs,
                   sum(n_tokens) AS n_tokens,
                   round(sum(n_tokens) / sum(n_docs), 4) AS mean_doc_tokens,
                   CAST(count(*) AS DOUBLE) AS n_langs,
                   round(-sum((n_docs / tot.total_docs)
                              * ln(n_docs / tot.total_docs)), 6) AS lang_entropy
            FROM per_lang CROSS JOIN tot
            GROUP BY tot.total_docs
        )
        SELECT 'n_docs' AS metric, n_docs AS value FROM wide
        UNION ALL SELECT 'n_tokens', n_tokens FROM wide
        UNION ALL SELECT 'mean_doc_tokens', mean_doc_tokens FROM wide
        UNION ALL SELECT 'n_langs', n_langs FROM wide
        UNION ALL SELECT 'lang_entropy', lang_entropy FROM wide
        UNION ALL SELECT 'exact_dup_rate',
                          round(dups.n_dup_docs / wide.n_docs, 6)
                  FROM wide CROSS JOIN dups
    """,
}
