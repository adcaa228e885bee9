"""BM25 relevance scoring over the documents table (Robertson & Zaragoza
2009; the lexical retrieval twin of ``llm/simsearch.py``'s dense ANN — a
corpus-curation stack keeps both, e.g. for dedup-aware eval-set mining
and quality-biased sampling).

    idf(t)     = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(d,q) = Σ_{t∈q} idf(t) · tf_td / (tf_td + k1·(1 - b + b·dl_d/avgdl))

Spark-first shape: one explode over the whitespace tokenizer (the corpus
convention in ``llm/textstats.py``), filtered to the query terms BEFORE
the aggregation so the shuffle carries only query-term hits; df and avgdl
are tiny aggregates joined back broadcast; the final score is one hash agg
per (doc). All JVM — split/explode/ln/sum, no Python.

At 100 TB: the per-(doc, term) tf table is |hits|, not |tokens| — the
term filter is pushed below the shuffle; df is |q| rows and avgdl is one
row, both driver-free broadcast scalars. Top-N bounds the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

QUERY_TERMS = ("spark", "join", "window")
K1 = 1.2
B = 0.75
TOP_N = 100


def text_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    dl = d.select("doc_id", F.size("toks").cast("double").alias("dl"))
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count("*").cast("double").alias("n_docs")
    )
    hits = (
        d.select("doc_id", F.explode("toks").alias("token"))
        .filter(F.col("token").isin(*QUERY_TERMS))
    )
    tf = hits.groupBy("doc_id", "token").agg(F.count("*").cast("double").alias("tf"))
    df = hits.groupBy("token").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * F.col("tf")
                / (
                    F.col("tf")
                    + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(TOP_N)
    )


_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

QUERIES = {"text_bm25_score": text_bm25_score}

ORACLE = {
    "text_bm25_score": f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM toks),
        stats AS (
            SELECT avg(dl) AS avgdl, CAST(count(*) AS DOUBLE) AS n_docs FROM dl
        ),
        hits AS (
            SELECT doc_id, unnest(toks) AS token FROM toks
        ),
        fhits AS (SELECT * FROM hits WHERE token IN ({_TERMS_SQL})),
        tf AS (
            SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
            FROM fhits GROUP BY doc_id, token
        ),
        df AS (
            SELECT token, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
            FROM fhits GROUP BY token
        )
        SELECT tf.doc_id,
               round(sum(
                   ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf
                   / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))
               ), 4) AS bm25
        FROM tf
        JOIN df USING (token)
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN stats
        GROUP BY tf.doc_id
        ORDER BY bm25 DESC, tf.doc_id
        LIMIT {TOP_N}
    """,
}
