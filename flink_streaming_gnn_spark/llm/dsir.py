"""DSIR data-selection importance weights (SURVEY.md north-star
"training-data curation" tier, next to ``mix_weights`` /
``quality_filter_pipeline``): Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling" — score every candidate
document by how much more likely it is under a TARGET-domain bag-of-
hashed-features language model than under the RAW-pool model,

    w(x) = Σ_features n_f(x) · (ln p_target(f) − ln p_raw(f)),

then keep the top-weighted candidates. Here the target corpus is the
``lang = 'en'`` slice and the candidate pool is everything else — the
"select raw text that looks like the target domain" setup of the paper.

Spark-first shape (and why it scales): hashing token features into
``N_BUCKETS`` buckets bounds BOTH language models at 64 rows regardless
of corpus size — the whole point of hashed DSIR. The corpus-sized work
is one explode + two hash aggregations (per-corpus bucket counts, and
per-(doc, bucket) counts); the LM table then joins in broadcast (64
rows), and the per-doc weight is one more hash aggregation over ≤ 64
terms per document. Nothing driver-side, no vocabulary join.

Engine-neutral feature hash: bucket = the 7th/8th hex nibbles of
md5(token) mod 64 — the ``dedup_simhash`` discipline (xxhash64 has no
DuckDB twin). Laplace add-1 smoothing keeps both LMs strictly positive
so the log-ratio is total. Weights are sums of ≤ 64 doubles, rounded to
6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

N_BUCKETS = 64
TARGET_LANG = "en"
TOP_K = 100


def _tokens(doc: DataFrame) -> DataFrame:
    return doc.select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("tok"),
    ).filter(F.col("tok") != "")


def _bucket_col():
    # nibbles 7..8 of md5 → 0..255 → mod 64; conv() is the repo-wide
    # engine-neutral hex decode (DuckDB twin: strpos nibble lookup).
    return (
        F.conv(F.substring(F.md5("tok"), 7, 2), 16, 10).cast("int")
        % N_BUCKETS
    ).alias("bucket")


def mix_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _tokens(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", _bucket_col()
    )
    # both corpus LMs in ONE conditional-count pass over the token stream
    lm = toks.groupBy("bucket").agg(
        F.sum((F.col("lang") == TARGET_LANG).cast("long")).alias("c_t"),
        F.sum((F.col("lang") != TARGET_LANG).cast("long")).alias("c_r"),
    )
    n_t = F.sum("c_t").over(Window.partitionBy())
    n_r = F.sum("c_r").over(Window.partitionBy())
    weights = lm.select(
        "bucket",
        (
            F.log((F.col("c_t") + 1.0) / (n_t + F.lit(float(N_BUCKETS))))
            - F.log((F.col("c_r") + 1.0) / (n_r + F.lit(float(N_BUCKETS))))
        ).alias("w"),
    )
    per_doc_bucket = (
        toks.filter(F.col("lang") != TARGET_LANG)
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )
    scored = (
        per_doc_bucket.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("n") * F.col("w")), 6).alias("dsir_weight"),
        )
    )
    return scored.orderBy(F.col("dsir_weight").desc(), "doc_id").limit(TOP_K)


_BUCKET_SQL = (
    "((strpos('0123456789abcdef', substr(md5(tok), 7, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(md5(tok), 8, 1)) - 1)"
    f" % {N_BUCKETS}"
)

QUERIES = {"mix_dsir_importance": mix_dsir_importance}

ORACLE = {
    "mix_dsir_importance": f"""
        WITH toks AS (
            SELECT doc_id, lang, {_BUCKET_SQL} AS bucket
            FROM (
                SELECT doc_id, lang,
                       unnest(string_split(text, ' ')) AS tok
                FROM documents
            )
            WHERE tok <> ''
        ),
        lm AS (
            SELECT bucket,
                   CAST(sum(CASE WHEN lang = '{TARGET_LANG}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS c_t,
                   CAST(sum(CASE WHEN lang <> '{TARGET_LANG}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS c_r
            FROM toks GROUP BY bucket
        ),
        w AS (
            SELECT bucket,
                   ln((c_t + 1.0) / (sum(c_t) OVER () + {N_BUCKETS}.0))
                 - ln((c_r + 1.0) / (sum(c_r) OVER () + {N_BUCKETS}.0)) AS w
            FROM lm
        ),
        per_doc AS (
            SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS n
            FROM toks WHERE lang <> '{TARGET_LANG}'
            GROUP BY doc_id, bucket
        )
        SELECT d.doc_id,
               CAST(sum(d.n) AS BIGINT) AS n_tokens,
               round(sum(d.n * w.w), 6) AS dsir_weight
        FROM per_doc d JOIN w ON w.bucket = d.bucket
        GROUP BY d.doc_id
        ORDER BY dsir_weight DESC, d.doc_id
        LIMIT {TOP_K}
    """,
}
