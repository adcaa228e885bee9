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


def stream_outer_join_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 11th end-to-end streaming key — the watermarked stream–stream
    LEFT OUTER interval join, the one join whose OUTPUT is determined by
    the watermark: matched pairs emit as soon as both rows have arrived;
    a purchase's null row emits only when the global watermark proves no
    matching click can still come (state eviction). Run as a REAL
    multi-trigger stream over the time-ordered replay.

    Determinism of the emitted set (pinned empirically at both fixture
    scales and in the oracle): Structured Streaming's global watermark is
    the MIN over both sides' watermarks — here
    ``min(max(purchase ts), max(click ts)) − 30 min`` after availableNow's
    final no-data batch — and a purchase's state is evictable once the
    watermark passes ``p_ts`` (the join condition's upper bound: a
    matching click has ``c_ts ≤ p_ts``). So the final sink holds ALL
    matched pairs + null rows exactly for unmatched purchases with
    ``p_ts < global_wm``; later unmatched purchases are withheld (the
    semantics of an unbounded stream, not data loss).
    """
    from flink_streaming_gnn_spark.streaming.replay import (
        events_stream,
        run_append_spooled,
    )

    stream = events_stream(spark, sf_dir, files_per_trigger=2)
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", f"{BAND_MINUTES} minutes")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", f"{BAND_MINUTES} minutes")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {BAND_MINUTES} MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "leftOuter",
    )
    out = run_append_spooled(
        joined.select("p_id", "p_user", "p_ts", "c_id", "c_ts"), "outer_join_e2e"
    )
    return out.select(
        "p_id",
        F.col("p_user").alias("user_id"),
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("p_ts"),
        "c_id",
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("c_ts"),
    ).orderBy("p_id", "c_id")


QUERIES = {
    "stream_stream_interval_join": stream_stream_interval_join,
    "stream_outer_join_e2e": stream_outer_join_e2e,
}

ORACLE = {
    # matched pairs = the batch interval join; null rows = unmatched
    # purchases whose ts the final global watermark (min of the two sides'
    # max ts, minus the delay) strictly passed
    "stream_outer_join_e2e": f"""
        WITH p AS (
            SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
            FROM events WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts
            FROM events WHERE event_type = 'click'
        ),
        wm AS (
            SELECT least((SELECT max(p_ts) FROM p), (SELECT max(c_ts) FROM c))
                   - INTERVAL '{BAND_MINUTES} minutes' AS w
        ),
        matched AS (
            SELECT p.p_id, p.p_user, p.p_ts, c.c_id, c.c_ts
            FROM p JOIN c
              ON p.p_user = c.c_user
             AND c.c_ts >= p.p_ts - INTERVAL '{BAND_MINUTES} minutes'
             AND c.c_ts <= p.p_ts
        ),
        nulls AS (
            SELECT p.p_id, p.p_user, p.p_ts,
                   CAST(NULL AS BIGINT) AS c_id,
                   CAST(NULL AS TIMESTAMP) AS c_ts
            FROM p
            WHERE p.p_id NOT IN (SELECT p_id FROM matched)
              AND p.p_ts < (SELECT w FROM wm)
        )
        SELECT p_id, p_user AS user_id,
               strftime(p_ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
               c_id,
               strftime(c_ts, '%Y-%m-%d %H:%M:%S') AS c_ts
        FROM (SELECT * FROM matched UNION ALL SELECT * FROM nulls)
        ORDER BY p_id, c_id
    """,
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
