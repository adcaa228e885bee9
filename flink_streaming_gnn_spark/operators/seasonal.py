"""Event-time profiling: seasonal load profile and SCD2 validity
intervals (SURVEY.md §2A A15 metrics family / §2B timeseries rows —
the two views an ops/warehouse layer derives from any event log).

* ``ts_seasonal_profile`` — (day-of-week × hour) load profile: event
  count, mean value, and lift vs the global mean. One hash agg over JVM
  calendar expressions + a 1-row broadcast global (no driver collect).
  Day-of-week convention pinned to 0=Sunday in BOTH engines (Spark
  ``dayofweek()-1`` == DuckDB ``dayofweek()``).
* ``scd2_intervals`` — slowly-changing-dimension type-2 build: each
  event opens a validity interval closed by the user's next event
  (``lead()``); the open interval is flagged current. One window sort
  per user, no join.
* ``ts_decompose_ma`` — classical moving-average seasonal decomposition
  (the STL-shaped trend/seasonal/residual split, Kendall–Stuart
  textbook form): hourly event counts → trend = centered 25-hour
  moving average (full frames only, edges NULL like the textbook
  definition) → seasonal = per hour-of-day mean of the detrended
  series → residual. The hourly series is a distributed pre-aggregation
  first; the windows then run over the |hours|-sized series (single
  reducer BY DEFINITION of a global decomposition — the abc_pareto
  discipline, input is the aggregate not the event log).

At 100 TB: the profile output is 168 rows regardless of input size
(perfectly mergeable); SCD2 rides a single user-partitioned sort —
the same exchange any per-user sessionization already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_streaming_gnn_spark.sources.tables import load_table


def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hr"),
        "value",
    )
    glob = ev.agg(F.avg("value").alias("gmean"))
    return (
        ev.groupBy("dow", "hr")
        .agg(F.count("*").cast("long").alias("n"), F.avg("value").alias("mean_v"))
        .crossJoin(F.broadcast(glob))
        .select(
            "dow",
            "hr",
            "n",
            F.round("mean_v", 4).alias("mean_value"),
            F.round(F.col("mean_v") / F.col("gmean"), 4).alias("lift"),
        )
    )


def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


MA_HALF = 12  # centered 25-hour trend window


def ts_decompose_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"),
    ).agg(F.count("*").cast("long").alias("n"))
    w_ma = Window.orderBy("bucket").rowsBetween(-MA_HALF, MA_HALF)
    trended = hourly.select(
        "bucket",
        "n",
        # full frames only: edges have no defined centered MA
        F.when(
            F.count("*").over(w_ma) == 2 * MA_HALF + 1,
            F.avg(F.col("n").cast("double")).over(w_ma),
        ).alias("trend"),
    ).withColumn("detr", F.col("n") - F.col("trend"))
    w_hod = Window.partitionBy(F.hour("bucket"))
    seas = trended.withColumn("seasonal", F.avg("detr").over(w_hod))
    return seas.select(
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "n",
        F.round("trend", 4).alias("trend"),
        F.round("seasonal", 4).alias("seasonal"),
        F.round(F.col("detr") - F.col("seasonal"), 4).alias("residual"),
    ).orderBy("bucket")


QUERIES = {
    "ts_seasonal_profile": ts_seasonal_profile,
    "scd2_intervals": scd2_intervals,
    "ts_decompose_ma": ts_decompose_ma,
}

ORACLE = {
    "ts_seasonal_profile": """
        WITH ev AS (
            SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
                   CAST(extract(hour FROM ts) AS BIGINT) AS hr,
                   value
            FROM events
        ),
        overall AS (SELECT avg(value) AS gmean FROM ev)
        SELECT dow, hr, CAST(count(*) AS BIGINT) AS n,
               round(avg(value), 4) AS mean_value,
               round(avg(value) / overall.gmean, 4) AS lift
        FROM ev CROSS JOIN overall
        GROUP BY dow, hr, overall.gmean
    """,
    "scd2_intervals": """
        SELECT user_id, event_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
               strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
               (lead(ts) OVER w IS NULL) AS is_current
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "ts_decompose_ma": f"""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS bucket,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        trended AS (
            SELECT bucket, n,
                   CASE WHEN count(*) OVER w_ma = {2 * MA_HALF + 1}
                        THEN avg(CAST(n AS DOUBLE)) OVER w_ma
                   END AS trend
            FROM hourly
            WINDOW w_ma AS (ORDER BY bucket
                            ROWS BETWEEN {MA_HALF} PRECEDING
                                     AND {MA_HALF} FOLLOWING)
        ),
        detr AS (SELECT *, n - trend AS d FROM trended),
        seas AS (
            SELECT *,
                   avg(d) OVER (PARTITION BY extract(hour FROM bucket))
                       AS seasonal
            FROM detr
        )
        SELECT strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket, n,
               round(trend, 4) AS trend,
               round(seasonal, 4) AS seasonal,
               round(d - seasonal, 4) AS residual
        FROM seas
        ORDER BY bucket
    """,
}
