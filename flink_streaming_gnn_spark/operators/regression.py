"""In-database linear regression (SURVEY.md §2B aggregations: the
``regr_*`` aggregate family — slope/intercept/R² as single-pass moment
aggregates, the warehouse-native way to fit y = a·x + b without moving
data to a client).

``agg_linear_regression`` fits order totalprice against lineitem count
per order (a real relationship in the fixture) for each order priority:
one join + ONE hash-aggregate pass computing count/slope/intercept/R²
from co-moments — all mergeable, so map-side partials absorb the fact
table exactly like any sum.

At 100 TB: regression over moments is the canonical "don't collect"
pattern — the shuffle carries 5 doubles per group regardless of input
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table


def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.count("*").cast("double").alias("n_items")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    joined = o.join(li, o.o_orderkey == li.l_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.regr_slope("o_totalprice", "n_items"), 4).alias("slope"),
        F.round(F.regr_intercept("o_totalprice", "n_items"), 4).alias("intercept"),
        F.round(F.regr_r2("o_totalprice", "n_items"), 6).alias("r2"),
    )


QUERIES = {"agg_linear_regression": agg_linear_regression}

ORACLE = {
    "agg_linear_regression": """
        WITH li AS (
            SELECT l_orderkey, CAST(count(*) AS DOUBLE) AS n_items
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               round(regr_slope(o_totalprice, n_items), 4) AS slope,
               round(regr_intercept(o_totalprice, n_items), 4) AS intercept,
               round(regr_r2(o_totalprice, n_items), 6) AS r2
        FROM orders JOIN li ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
    """,
}
