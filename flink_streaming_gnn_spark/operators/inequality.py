"""Distributional shape analytics (SURVEY.md §2B analytics family):
the Gini coefficient and a Zipf-law fit — the two summary statistics a
corpus/revenue analyst reaches for when asking "how concentrated is
this distribution".

* ``agg_gini_coefficient`` — Gini of supplier revenue via the exact
  rank formula over the sorted distribution,

      G = 2·Σ i·x_(i) / (n·Σ x) − (n+1)/n,

  computed with one rank window + one aggregate over the per-supplier
  revenue table (|suppliers| rows — the window is single-reducer by
  definition of a GLOBAL inequality statistic over an aggregate, the
  abc_pareto discipline; the fact-table pass below it is distributed).
* ``text_zipf_fit`` — fit the Zipf exponent: token frequencies ranked
  desc, then OLS of ln(freq) on ln(rank) via ``regr_slope`` /
  ``regr_r2`` — the slope is −s in freq ∝ rank^(−s) and r² says how
  Zipfian the corpus is (natural text ≈ −1 with high r²). One corpus
  token aggregation, one rank window over the |vocab|-sized table, one
  regression aggregate.

Both round to 6 dp; ties in the rank windows carry deterministic
tie-breaks so the ranks (and therefore the sums) are identical across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table


def agg_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    w = Window.orderBy("revenue", "l_suppkey")
    ranked = rev.select(
        "revenue", F.row_number().over(w).cast("double").alias("i")
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_suppliers"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("revenue"))
            / (F.count("*") * F.sum("revenue"))
            - (F.count("*") + 1.0) / F.count("*"),
            6,
        ).alias("gini"),
    )


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").cast("double").alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("token"))
    ranked = freq.select(
        F.log(F.row_number().over(w).cast("double")).alias("lr"),
        F.log("freq").alias("lf"),
    )
    return ranked.agg(
        F.count("*").cast("long").alias("vocab"),
        F.round(F.regr_slope("lf", "lr"), 6).alias("zipf_slope"),
        F.round(F.regr_r2("lf", "lr"), 6).alias("zipf_r2"),
    )


QUERIES = {
    "agg_gini_coefficient": agg_gini_coefficient,
    "text_zipf_fit": text_zipf_fit,
}

ORACLE = {
    "agg_gini_coefficient": """
        WITH rev AS (
            SELECT l_suppkey,
                   sum(l_extendedprice * (1 - l_discount)) AS revenue
            FROM lineitem GROUP BY l_suppkey
        ),
        ranked AS (
            SELECT revenue,
                   CAST(row_number() OVER (ORDER BY revenue, l_suppkey)
                        AS DOUBLE) AS i
            FROM rev
        )
        SELECT CAST(count(*) AS BIGINT) AS n_suppliers,
               round(2.0 * sum(i * revenue) / (count(*) * sum(revenue))
                     - (count(*) + 1.0) / count(*), 6) AS gini
        FROM ranked
    """,
    "text_zipf_fit": """
        WITH freq AS (
            SELECT token, CAST(count(*) AS DOUBLE) AS freq
            FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
            WHERE token <> ''
            GROUP BY token
        ),
        ranked AS (
            SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, token)
                           AS DOUBLE)) AS lr,
                   ln(freq) AS lf
            FROM freq
        )
        SELECT CAST(count(*) AS BIGINT) AS vocab,
               round(regr_slope(lf, lr), 6) AS zipf_slope,
               round(regr_r2(lf, lr), 6) AS zipf_r2
        FROM ranked
    """,
}
