"""Two-feature OLS and sequential path mining (SURVEY.md §2B
aggregation / analytics families).

* ``agg_multiple_regression`` — multiple linear regression of order
  revenue on (n_items, total_qty) in CLOSED FORM: one distributed pass
  accumulates the 9 normal-equation moments, then Cramer's rule on the
  centered 2×2 system yields (b0, b1, b2) and R² = (b·Sxy)/Syy — the
  ``agg_linear_regression`` discipline lifted to two regressors. No
  iteration, no matrix library: the solve is six scalar expressions.
* ``event_path_mining`` — top-20 three-step event-type paths (the
  "top user journeys" query of product analytics): two ``lag`` taps
  over ONE user-keyed window sort, a path aggregate bounded by
  |event_type|³, deterministic (count desc, path) top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

PATH_TOP_K = 20


def agg_multiple_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").cast("double").alias("x1"),
        F.sum("l_quantity").alias("x2"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("y"),
    )
    m = per_order.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx1x1"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx2x2"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx1x2"),
        F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("sx2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    s11 = F.col("sx1x1") - F.col("sx1") * F.col("sx1") / F.col("n")
    s22 = F.col("sx2x2") - F.col("sx2") * F.col("sx2") / F.col("n")
    s12 = F.col("sx1x2") - F.col("sx1") * F.col("sx2") / F.col("n")
    s1y = F.col("sx1y") - F.col("sx1") * F.col("sy") / F.col("n")
    s2y = F.col("sx2y") - F.col("sx2") * F.col("sy") / F.col("n")
    syy = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    det = s11 * s22 - s12 * s12
    b1 = (s1y * s22 - s2y * s12) / det
    b2 = (s2y * s11 - s1y * s12) / det
    b0 = (F.col("sy") - b1 * F.col("sx1") - b2 * F.col("sx2")) / F.col("n")
    r2 = (b1 * s1y + b2 * s2y) / syy
    return m.select(
        F.col("n").cast("long").alias("n_orders"),
        F.round(b0, 6).alias("b0"),
        F.round(b1, 6).alias("b1"),
        F.round(b2, 6).alias("b2"),
        F.round(r2, 6).alias("r2"),
    )


def event_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = ev.select(
        F.concat_ws(
            ">",
            F.lag("event_type", 2).over(w),
            F.lag("event_type", 1).over(w),
            F.col("event_type"),
        ).alias("path"),
        F.lag("event_type", 2).over(w).alias("_p2"),
    ).filter(F.col("_p2").isNotNull())
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(PATH_TOP_K)
    )


QUERIES = {
    "agg_multiple_regression": agg_multiple_regression,
    "event_path_mining": event_path_mining,
}

ORACLE = {
    "agg_multiple_regression": """
        WITH per_order AS (
            SELECT CAST(count(*) AS DOUBLE) AS x1,
                   sum(l_quantity) AS x2,
                   sum(l_extendedprice * (1 - l_discount)) AS y
            FROM lineitem GROUP BY l_orderkey
        ),
        m AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
                   sum(x1*x1) AS sx1x1, sum(x2*x2) AS sx2x2,
                   sum(x1*x2) AS sx1x2,
                   sum(x1*y) AS sx1y, sum(x2*y) AS sx2y,
                   sum(y*y) AS syy
            FROM per_order
        ),
        c AS (
            SELECT n, sx1, sx2, sy, sx1y, sx2y,
                   sx1x1 - sx1*sx1/n AS s11,
                   sx2x2 - sx2*sx2/n AS s22,
                   sx1x2 - sx1*sx2/n AS s12,
                   sx1y - sx1*sy/n AS s1y,
                   sx2y - sx2*sy/n AS s2y,
                   syy - sy*sy/n AS scyy
            FROM m
        ),
        b AS (
            SELECT n, sx1, sx2, sy, s1y, s2y, scyy,
                   (s1y*s22 - s2y*s12) / (s11*s22 - s12*s12) AS b1,
                   (s2y*s11 - s1y*s12) / (s11*s22 - s12*s12) AS b2
            FROM c
        )
        SELECT CAST(n AS BIGINT) AS n_orders,
               round((sy - b1*sx1 - b2*sx2) / n, 6) AS b0,
               round(b1, 6) AS b1,
               round(b2, 6) AS b2,
               round((b1*s1y + b2*s2y) / scyy, 6) AS r2
        FROM b
    """,
    "event_path_mining": f"""
        WITH lagged AS (
            SELECT lag(event_type, 2) OVER w AS p2,
                   lag(event_type, 1) OVER w AS p1,
                   event_type AS p0
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT p2 || '>' || p1 || '>' || p0 AS path,
               CAST(count(*) AS BIGINT) AS n
        FROM lagged WHERE p2 IS NOT NULL
        GROUP BY 1
        ORDER BY n DESC, path
        LIMIT {PATH_TOP_K}
    """,
}
