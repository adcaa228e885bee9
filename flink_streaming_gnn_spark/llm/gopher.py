"""Gopher-style document quality rules (Rae et al. 2021, "Scaling
Language Models: ... Gopher", §A1.1 — public heuristics) over
``documents`` — the rule-based sibling of ``text_quality_score``'s
continuous score and the per-rule filter bank ``quality_filter_pipeline``
composes.

Each rule is a pure JVM expression over the token array (split once,
reused by every rule — Catalyst collapses the shared subexpression into
one split per row inside a single whole-stage-codegen project):

* word count within [MIN_WORDS, MAX_WORDS];
* mean word length within [MIN_MWL, MAX_MWL];
* fraction of words containing an alphabetic character ≥ MIN_ALPHA;
* ≥ MIN_STOP distinct-occurrence stopword hits (tiny literal list);
* symbol-to-word ratio ('#' and '...') ≤ MAX_SYMBOL.

Map-only: no shuffle, no Python; at 100 TB this runs at scan speed with
the text column pruned away in the output (metrics + keep flag only).
Exact oracle: DuckDB list_filter/string_split twins of each rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

MIN_WORDS, MAX_WORDS = 10, 100_000
MIN_MWL, MAX_MWL = 3.0, 10.0
MIN_ALPHA = 0.8
MIN_STOP = 2
MAX_SYMBOL = 0.1
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "that", "for", "it")


def text_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    toks = F.split("text", " ")
    n_words = F.size(toks).cast("double")
    # single-space-joined corpus: chars = Σ|w| + (n−1) separators
    mean_wl = (F.col("n_chars") - (n_words - 1)) / n_words
    alpha_frac = (
        F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]"))).cast("double") / n_words
    )
    stop_hits = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS)))
    hash_n = F.col("n_chars") - F.length(F.regexp_replace("text", "#", ""))
    ellipsis_n = (
        F.col("n_chars") - F.length(F.regexp_replace("text", r"\.\.\.", ""))
    ) / 3
    symbol_ratio = (hash_n + ellipsis_n).cast("double") / n_words
    keep = (
        n_words.between(MIN_WORDS, MAX_WORDS)
        & mean_wl.between(MIN_MWL, MAX_MWL)
        & (alpha_frac >= MIN_ALPHA)
        & (stop_hits >= MIN_STOP)
        & (symbol_ratio <= MAX_SYMBOL)
    )
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(alpha_frac, 4).alias("alpha_frac"),
        stop_hits.cast("long").alias("stop_hits"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        keep.alias("keep"),
    )


_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

QUERIES = {"text_quality_gopher": text_quality_gopher}

ORACLE = {
    "text_quality_gopher": f"""
        WITH m AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS nw,
                   (n_chars - (len(string_split(text, ' ')) - 1)) * 1.0
                       / len(string_split(text, ' ')) AS mwl,
                   len(list_filter(string_split(text, ' '),
                                   w -> regexp_matches(w, '[A-Za-z]'))) * 1.0
                       / len(string_split(text, ' ')) AS alpha_frac,
                   len(list_filter(string_split(text, ' '),
                                   w -> w IN ({_STOP_SQL}))) AS stop_hits,
                   ((n_chars - length(replace(text, '#', '')))
                    + (n_chars - length(replace(text, '...', ''))) / 3) * 1.0
                       / len(string_split(text, ' ')) AS symbol_ratio
            FROM documents
        )
        SELECT doc_id,
               CAST(nw AS BIGINT) AS n_words,
               round(mwl, 4) AS mean_word_len,
               round(alpha_frac, 4) AS alpha_frac,
               CAST(stop_hits AS BIGINT) AS stop_hits,
               round(symbol_ratio, 4) AS symbol_ratio,
               (nw BETWEEN {MIN_WORDS} AND {MAX_WORDS}
                AND mwl BETWEEN {MIN_MWL} AND {MAX_MWL}
                AND alpha_frac >= {MIN_ALPHA}
                AND stop_hits >= {MIN_STOP}
                AND symbol_ratio <= {MAX_SYMBOL}) AS keep
        FROM m
    """,
}
