"""Date/time function family (SURVEY.md §2B fn_date).

Timestamps cross the engine boundary as formatted UTC strings — the one
representation both Spark (µs, session-TZ UTC) and DuckDB (ns, naive)
render identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table


def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_2002"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "yyyy-MM-dd HH:mm:ss")
        .alias("due_time"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    )


QUERIES = {"fn_date": fn_date}

ORACLE = {
    "fn_date": """
        SELECT o_orderkey,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
               CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS mon,
               CAST(day(o_orderdate) AS BIGINT) AS dom,
               CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT)
                   AS days_to_2002,
               strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d %H:%M:%S') AS due_time,
               strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
        FROM orders
    """,
}
