"""Event-time window semantics (SURVEY.md §2B streaming rows).

Each query here is the *batch* evaluation of a streaming plan. The
tumbling and session queries run unchanged in a ``readStream`` pipeline
(proved by the batch≡stream tests in ``tests/test_streaming.py``). The
sliding query is the one exception: its exact ``countDistinct(user_id)``
is unsupported on streaming DataFrames, so a streamed deployment swaps it
for ``approx_count_distinct`` — the batch form here stays exact so the
DuckDB oracle can hash-match it; ``stream_sliding_window_streaming_aggs``
below is the drop-in streaming-safe aggregate list. The DuckDB twins pin
the semantics: tumbling = epoch-aligned time_bucket, sliding = 4
overlapping 15-min slides, session = 30-min lag-gap chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.plans.hints import maybe_broadcast
from flink_streaming_gnn_spark.sources.tables import load_table


def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window × event_type counts/sums (BASELINE
    ``tumbling_window_events``)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_sliding_window_streaming_aggs() -> list:
    """The streaming-safe aggregate list for the sliding window: exact
    distinct aggregation is unsupported on streaming DataFrames, so the
    streamed deployment uses the HLL sketch (approx_count_distinct) —
    which is also the right call at 100 TB, where exact per-window
    distincts would keep unbounded key state."""
    return [
        F.count("*").cast("long").alias("n_events"),
        F.approx_count_distinct("user_id").alias("n_users"),
    ]


def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 minutes — every event lands in
    exactly 4 overlapping windows. Batch form: exact countDistinct (so the
    oracle hash-matches); see stream_sliding_window_streaming_aggs for the
    streaming-legal variant."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "n_users",
        )
    )


def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap (BASELINE
    ``sessionize_approx``). A new session opens when the gap since the
    previous event is >= 30 min; identical semantics to Spark's
    ``session_window`` (which ``stream_session_e2e`` uses on the real
    stream, where state-store merging is the point).

    Batch path is gaps-and-islands, not the native ``session_window``
    operator: one exchange on user_id, a lag to mark boundaries and a
    running sum to number sessions (both windows ride the same sort),
    then the session aggregate reuses the partitioning. Measured at the
    sf~1 bench corpus (10M events): 4 s steady-state vs 10–43 s for the
    UpdatingSessions-based native operator, whose per-row session-bound
    expansion + re-sort dominate — and vs 15 s for DuckDB's identical
    gaps-and-islands SQL. Boundary determinism: equal-timestamp ties
    within a user land in the same session whatever their sort order (a
    zero gap never opens a session), so the result is partition- and
    order-invariant."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    # gap at FULL timestamp precision: unix_micros is exact integer
    # microseconds, matching both the native session_window operator and
    # the oracle's interval comparison — unix_timestamp truncates to whole
    # seconds, which flips a session split whenever a gap straddles the
    # 30-min boundary within 1s (≈1 such gap already at sf0.1)
    # (fixture ts is TIMESTAMP_NTZ; the cast is exact under the UTC session tz)
    epoch_us = F.unix_micros(F.col("ts").cast("timestamp"))
    marked = ev.select(
        "user_id",
        "ts",
        "value",
        F.when((epoch_us - F.lag(epoch_us).over(w)) >= 1800 * 1_000_000, 1)
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = marked.withColumn("sid", F.sum("new_sess").over(w))
    return (
        sess.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("start"),
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup semantics: distinct (user_id, event_type) — the batch
    twin of ``dropDuplicates`` (streaming variant exercised in tests with
    ``dropDuplicatesWithinWatermark``). Only key columns are projected, so
    the result is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").dropDuplicates()


def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–static join: events against the customer dim. The static
    side is broadcast only while Catalyst estimates it small (customer
    grows with sf — at 100 TB the stream-static join must be free to
    shuffle); when broadcast, it is re-broadcast per micro-batch."""
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        ev.join(maybe_broadcast(c), ev.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


QUERIES = {
    "stream_tumbling_window": stream_tumbling_window,
    "tumbling_window_events": stream_tumbling_window,  # BASELINE.md name
    "stream_sliding_window": stream_sliding_window,
    "stream_session_window": stream_session_window,
    "sessionize_approx": stream_session_window,  # BASELINE.md name
    "stream_dedup": stream_dedup,
    "stream_static_join": stream_static_join,
}

_TUMBLING_SQL = """
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
"""

_SESSION_SQL = """
    WITH gaps AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL '30 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM gaps
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
"""

ORACLE = {
    "stream_tumbling_window": _TUMBLING_SQL,
    "tumbling_window_events": _TUMBLING_SQL,
    "stream_sliding_window": """
        WITH slides AS (
            SELECT time_bucket(INTERVAL '15 minutes', ts)
                       - k.k * INTERVAL '15 minutes' AS window_start,
                   user_id
            FROM events
            CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k
        )
        SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM slides
        GROUP BY 1
    """,
    "stream_session_window": _SESSION_SQL,
    "sessionize_approx": _SESSION_SQL,
    "stream_dedup": "SELECT DISTINCT user_id, event_type FROM events",
    "stream_static_join": """
        SELECT c_mktsegment, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(avg(value), 4) AS avg_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment, event_type
    """,
}
