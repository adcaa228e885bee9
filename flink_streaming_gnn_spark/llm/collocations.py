"""Bigram collocation mining by pointwise mutual information
(SURVEY.md §2B text-analysis family; Church & Hanks 1990 — the
association measure behind phrase detectors à la word2vec's phrase
pass).

PMI(a,b) = ln( p(ab) / (p(a)·p(b)) ) over adjacent in-document token
pairs. Spark-first shape: one map-side ``transform(sequence(...))``
builds the adjacent-pair structs per row (no join for pairing), then
two hash aggs (bigram counts, unigram counts) and two joins of the
bigram table onto the vocabulary-sized unigram table — both gated with
``maybe_broadcast`` since vocabularies grow with the corpus. Corpus
totals are two O(1) driver scalars. Output is bounded: pairs with
count ≥ MIN_PAIR, top-100 by rounded PMI.

Cross-engine float discipline: PMI is derived from exact integer counts
via the same division/ln expression shape in both engines — the only
inexactness is libm ln's last ulp, far below the 6-dp rounding; ordering
uses the ROUNDED pmi plus (w1, w2) tiebreak so the top-100 cut is
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.plans.hints import maybe_broadcast
from flink_streaming_gnn_spark.sources.tables import load_table

MIN_PAIR = 5
TOP_N = 100


def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("toks")
    )
    toks = d.select(F.explode("toks").alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").alias("c1"))
    n1 = toks.count()  # O(1) scalar: total tokens
    pairs = d.select(
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("p")
    ).select("p.w1", "p.w2")
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    n2 = pairs.count()  # O(1) scalar: total bigrams
    u1 = uni.select(F.col("w").alias("w1"), F.col("c1").alias("ca"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c1").alias("cb"))
    pmi = (
        big.filter(F.col("c2") >= MIN_PAIR)
        .join(maybe_broadcast(u1), "w1")
        .join(maybe_broadcast(u2), "w2")
        .select(
            "w1",
            "w2",
            F.col("c2").cast("long").alias("pair_n"),
            F.round(
                F.log(
                    (F.col("c2") / F.lit(float(n2)))
                    / (
                        (F.col("ca") / F.lit(float(n1)))
                        * (F.col("cb") / F.lit(float(n1)))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return pmi.orderBy(F.col("pmi").desc(), "w1", "w2").limit(TOP_N)


def _pmi_oracle_sql() -> str:
    return f"""
        WITH t AS (
            SELECT string_split(text, ' ') AS toks FROM documents
        ),
        uni AS (
            SELECT unnest(toks) AS w FROM t
        ),
        ucnt AS (SELECT w, count(*) AS c1 FROM uni GROUP BY w),
        n1 AS (SELECT count(*) AS n FROM uni),
        pairs AS (
            -- scalar range list unnested per row: i = 1..len-1 (the table
            -- function form rejects lateral column arguments)
            SELECT toks[i] AS w1, toks[i + 1] AS w2
            FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM t)
        ),
        bcnt AS (
            SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY w1, w2
        ),
        n2 AS (SELECT count(*) AS n FROM pairs)
        SELECT b.w1, b.w2,
               CAST(b.c2 AS BIGINT) AS pair_n,
               round(ln((b.c2 / (SELECT n * 1.0 FROM n2))
                        / ((ua.c1 / (SELECT n * 1.0 FROM n1))
                           * (ub.c1 / (SELECT n * 1.0 FROM n1)))), 6) AS pmi
        FROM bcnt b
        JOIN ucnt ua ON ua.w = b.w1
        JOIN ucnt ub ON ub.w = b.w2
        WHERE b.c2 >= {MIN_PAIR}
        ORDER BY pmi DESC, b.w1, b.w2
        LIMIT {TOP_N}
    """


QUERIES = {"text_bigram_pmi": text_bigram_pmi}
ORACLE = {"text_bigram_pmi": _pmi_oracle_sql()}
