"""Skew-mitigation operators (SURVEY.md §4.3 100 TB posture: "skewed keys →
salting or AQE skew-join").

AQE's skew-join splitting handles *joins* at runtime; aggregation skew on
low-cardinality hot keys (a 3-value group-by over 100 TB puts a third of
the data through one reducer) needs the classic two-stage salted rewrite:

    groupBy(key, salt) partial  →  groupBy(key) final

Salting is result-preserving for algebraic aggregates, so the operator is
fully oracle-checkable — the DuckDB twin is the plain single-stage GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

N_SALTS = 16


def salted(df: DataFrame, salt_source: str, n_salts: int = N_SALTS) -> DataFrame:
    """Attach a deterministic salt column derived from a high-cardinality
    source column (not rand(): replayable plans beat nondeterminism)."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(salt_source), F.lit(n_salts)))


def salted_sum(df: DataFrame, key: str, salt_source: str, exprs: dict[str, Column]) -> DataFrame:
    """Two-stage skew-safe aggregation: partial per (key, salt) — fanning a
    hot key across n_salts reducers — then final per key. ``exprs`` maps
    output name → commutative partial expression (sum/count terms)."""
    partial = (
        salted(df, salt_source)
        .groupBy(key, "_salt")
        .agg(*[e.alias(name) for name, e in exprs.items()])
    )
    return partial.groupBy(key).agg(
        *[F.sum(name).alias(name) for name in exprs]
    )


def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing roll-up by l_returnflag — 3 hot keys over the whole fact
    table, the textbook aggregation-skew shape — via the salted two-stage
    plan. Values identical to the direct GROUP BY (the oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_sum(
        li,
        "l_returnflag",
        "l_orderkey",
        {
            "sum_qty": F.sum("l_quantity"),
            "sum_price": F.sum("l_extendedprice"),
            "n_rows": F.count("*").cast("long"),
        },
    )
    return out.select(
        "l_returnflag",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("sum_price", 2).alias("sum_price"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )


def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-replicate join for hot-key JOIN skew — the rewrite you reach
    for when the skewed side is too big for AQE's in-partition splitting
    and the other side can't be broadcast whole: the fact side gets a
    deterministic salt in [0, N), the dimension side is replicated N× (one
    copy per salt via a zero-shuffle sequence+explode), and the join runs
    on (key, salt) so each hot key fans across N reducers.

    Fixture shape: per-returnflag price stats (3 hot keys over the whole
    fact table) joined back to score each row's deviation, rolled up per
    (flag, status). Salting is result-preserving, so the DuckDB twin is the
    plain join — a hash match proves the rewrite changes the physical
    fan-out and nothing else."""
    li = load_table(spark, sf_dir, "lineitem")
    dim = li.groupBy("l_returnflag").agg(
        F.avg("l_extendedprice").alias("flag_avg")
    )
    dim_salted = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
    )
    fact = salted(li, "l_orderkey")
    return (
        fact.join(dim_salted, ["l_returnflag", "_salt"])
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.round(F.avg(F.abs(F.col("l_extendedprice") - F.col("flag_avg"))), 4).alias(
                "avg_abs_dev"
            ),
        )
    )


QUERIES = {
    "agg_salted_skew": agg_salted_skew,
    "join_salted_skew": join_salted_skew,
}

ORACLE = {
    "agg_salted_skew": """
        SELECT l_returnflag,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "join_salted_skew": """
        WITH dim AS (
            SELECT l_returnflag, avg(l_extendedprice) AS flag_avg
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT li.l_returnflag, li.l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               round(avg(abs(li.l_extendedprice - dim.flag_avg)), 4) AS avg_abs_dev
        FROM lineitem li JOIN dim USING (l_returnflag)
        GROUP BY li.l_returnflag, li.l_linestatus
    """,
}
