"""Stream–stream interval join (SURVEY.md §2B streaming rows; the
reference's Flink lineage makes the event-time interval join — two
unbounded inputs, a time-banded equi-join — the signature streaming
operator still missing after tumbling/sliding/session windows and the
stream–static join).

Semantics: purchases joined to the same user's clicks that happened in the
30 minutes *before* the purchase — the attribution join. In Structured
Streaming this is the canonical watermarked stream-stream inner join: both
sides declare a watermark, the join condition carries the time band, and
Spark sizes the join state buffer from exactly those two facts (a click
can be dropped from state once the watermark passes its ts + 30 min).

Spark-first shape: the batch form below IS the streaming plan — same join
condition, same columns — executed over the bounded fixture; the
batch≡stream equivalence (file replay, AvailableNow, append mode) is
pinned in tests/test_stream_join.py. One shuffle on user_id for both
sides; at 100 TB both streams arrive Kafka-partitioned by user, so the
exchange is a no-op under a co-partitioned reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

BAND_MINUTES = 30


def _sides(ev: DataFrame) -> tuple[DataFrame, DataFrame]:
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    return purchases, clicks


def interval_join(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """The shared join core — valid on batch AND watermarked streaming
    inputs unchanged (the condition shape is what Structured Streaming
    requires to bound state)."""
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {BAND_MINUTES} MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )


def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry key (batch form): per purchase, the count/value of the same
    user's clicks in the preceding 30 minutes."""
    purchases, clicks = _sides(load_table(spark, sf_dir, "events"))
    return (
        interval_join(purchases, clicks)
        .groupBy("p_id", "p_user")
        .agg(
            F.count("*").cast("long").alias("n_prior_clicks"),
            F.round(F.sum("c_value"), 4).alias("sum_click_value"),
        )
        .select(
            F.col("p_id").alias("purchase_id"),
            F.col("p_user").alias("user_id"),
            "n_prior_clicks",
            "sum_click_value",
        )
    )


QUERIES = {"stream_stream_interval_join": stream_stream_interval_join}

ORACLE = {
    "stream_stream_interval_join": f"""
        SELECT p.event_id AS purchase_id,
               p.user_id AS user_id,
               CAST(count(*) AS BIGINT) AS n_prior_clicks,
               round(sum(c.value), 4) AS sum_click_value
        FROM events p
        JOIN events c
          ON p.user_id = c.user_id
         AND c.ts >= p.ts - INTERVAL '{BAND_MINUTES} minutes'
         AND c.ts <= p.ts
        WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        GROUP BY p.event_id, p.user_id
    """,
}
