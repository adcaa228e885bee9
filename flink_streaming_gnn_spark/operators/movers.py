"""Growth-accounting analytics (SURVEY.md §2B OLAP family, next to
``olap_period_over_period`` / ``cohort_retention``):

* ``olap_top_movers`` — the biggest month-over-month revenue swings per
  nation ("what changed most, where?"): monthly revenue per nation from
  one fact pass with broadcast dimensions, MoM delta via one lag per
  nation-partitioned month series, top-10 absolute swings. Deltas are
  computed on the ROUNDED monthly totals (2 dp) so the ranking inputs
  are identical across engines.
* ``olap_new_vs_returning`` — the daily new/returning active-user split
  (the growth-accounting denominator every product dashboard leads
  with): a user's first-ever event day marks them new on that day,
  returning on every later active day. One per-user first-day
  aggregate + one distinct (user, day) projection + one bounded daily
  aggregate — all integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.plans.hints import maybe_broadcast
from flink_streaming_gnn_spark.sources.tables import load_table

TOP_MOVERS = 10


def olap_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.date_trunc("month", "l_shipdate").alias("month"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    monthly = (
        li.join(maybe_broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "month")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("month")
    deltas = monthly.select(
        "n_name",
        "month",
        "revenue",
        F.round(F.col("revenue") - F.lag("revenue").over(w), 2).alias("mom_delta"),
    ).filter(F.col("mom_delta").isNotNull())
    return deltas.orderBy(
        F.abs("mom_delta").desc(), "n_name", "month"
    ).limit(TOP_MOVERS)


def olap_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    active = ev.distinct()
    firsts = active.groupBy("user_id").agg(F.min("day").alias("first_day"))
    flagged = active.join(maybe_broadcast(firsts), "user_id").select(
        "day", (F.col("day") == F.col("first_day")).alias("is_new")
    )
    return (
        flagged.groupBy("day")
        .agg(
            F.sum(F.col("is_new").cast("long")).cast("long").alias("new_users"),
            F.sum((~F.col("is_new")).cast("long")).cast("long").alias("returning_users"),
            F.count("*").cast("long").alias("active_users"),
        )
        .orderBy("day")
    )


QUERIES = {
    "olap_top_movers": olap_top_movers,
    "olap_new_vs_returning": olap_new_vs_returning,
}

ORACLE = {
    "olap_top_movers": f"""
        WITH monthly AS (
            SELECT n.n_name, date_trunc('month', l.l_shipdate) AS month,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                       AS revenue
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            GROUP BY n.n_name, date_trunc('month', l.l_shipdate)
        ),
        deltas AS (
            SELECT n_name, month, revenue,
                   round(revenue - lag(revenue) OVER (
                       PARTITION BY n_name ORDER BY month), 2) AS mom_delta
            FROM monthly
        )
        SELECT n_name, month, revenue, mom_delta
        FROM deltas WHERE mom_delta IS NOT NULL
        ORDER BY abs(mom_delta) DESC, n_name, month
        LIMIT {TOP_MOVERS}
    """,
    "olap_new_vs_returning": """
        WITH active AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        ),
        firsts AS (
            SELECT user_id, min(day) AS first_day FROM active GROUP BY user_id
        )
        SELECT a.day,
               CAST(sum(CASE WHEN a.day = f.first_day THEN 1 ELSE 0 END)
                    AS BIGINT) AS new_users,
               CAST(sum(CASE WHEN a.day <> f.first_day THEN 1 ELSE 0 END)
                    AS BIGINT) AS returning_users,
               CAST(count(*) AS BIGINT) AS active_users
        FROM active a JOIN firsts f ON f.user_id = a.user_id
        GROUP BY a.day
        ORDER BY a.day
    """,
}
