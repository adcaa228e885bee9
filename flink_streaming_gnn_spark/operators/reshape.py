"""Relational reshaping — UNPIVOT/melt (SURVEY.md §2B aggregations: the
inverse of ``agg_pivot``; long↔wide conversion is a standard warehouse
operator the reference's metric sinks consume as tall series).

``unpivot_melt`` builds a wide per-nation revenue summary (one hash agg)
and melts its three measure columns into (nation, metric, val) rows with
Spark's native ``DataFrame.unpivot`` — the Expand-based physical op (one
projection emitting 3 rows per input row, zero extra shuffle, no Python).
The DuckDB twin is the literal UNION ALL expansion, proving the melt
semantics (NULL measures are dropped by UNPIVOT — none arise here).

At 100 TB: Expand multiplies rows by the measure count *after* the
aggregation, so the melt rides on |groups|×|measures| rows, never on the
fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

_MEASURES = ("total_revenue", "avg_order_value", "n_orders")


def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    wide = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_order_value"),
            F.count("*").cast("double").alias("n_orders"),
        )
    )
    return wide.unpivot(
        ids=["n_name"],
        values=list(_MEASURES),
        variableColumnName="metric",
        valueColumnName="val",
    )


_WIDE_CTE = """
    wide AS (
        SELECT n_name,
               round(sum(o_totalprice), 2) AS total_revenue,
               round(avg(o_totalprice), 4) AS avg_order_value,
               CAST(count(*) AS DOUBLE) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    )
"""

QUERIES = {"unpivot_melt": unpivot_melt}

ORACLE = {
    "unpivot_melt": f"""
        WITH {_WIDE_CTE}
        SELECT n_name, 'total_revenue' AS metric, total_revenue AS val FROM wide
        UNION ALL
        SELECT n_name, 'avg_order_value', avg_order_value FROM wide
        UNION ALL
        SELECT n_name, 'n_orders', n_orders FROM wide
    """,
}
