"""Behavioral event analytics (SURVEY.md §2B analytics family): Markov
transition matrix and RFM segmentation over the events stream — the two
session-analytics primitives next to the existing cohort/funnel/streaks
operators.

``event_transition_matrix``: first-order Markov transition counts and
probabilities between consecutive event types per user. One ``lag``
window (shuffle on user_id, the same partitioning every sessionization
op here rides) + one (prev, next) aggregate whose output is bounded by
|event_type|² regardless of corpus size — the transition matrix is the
classic input to next-event prediction and bot detection.

``user_rfm_segments``: Recency / Frequency / Monetary quartile scoring.
Per-user aggregate (one shuffle on user_id), then three ``ntile(4)``
rankings with full deterministic tie-breaks. The ntile windows are
unpartitioned — a deliberate, documented single-reducer: the input is
already one row per user (≪ events), and exact quantile assignment is
the point of the oracle check. At 100 TB you'd swap exact ntile for
approx-quantile cutoffs broadcast back (same discipline as
``abc_pareto_class``'s documented single-reducer cumsum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

N_TILES = 4


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(prev_type, next_type) counts + per-prev transition probability
    over consecutive events per user, ordered by (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    w_prev = Window.partitionBy("prev_type")
    return (
        pairs.groupBy("prev_type", "next_type")
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn("p", F.round(F.col("n") / F.sum("n").over(w_prev), 6))
        .orderBy("prev_type", "next_type")
    )


def user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user RFM quartiles: recency (latest event first), frequency,
    monetary — each ntile(4) with user_id tie-break; segment = 'rfm'."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").cast("long").alias("frequency"),
        F.round(F.sum("value"), 2).alias("monetary"),
    )
    r = F.ntile(N_TILES).over(Window.orderBy(F.col("last_ts").desc(), "user_id"))
    f = F.ntile(N_TILES).over(Window.orderBy(F.col("frequency").desc(), "user_id"))
    m = F.ntile(N_TILES).over(Window.orderBy(F.col("monetary").desc(), "user_id"))
    return (
        per_user.select(
            "user_id",
            "last_ts",
            "frequency",
            "monetary",
            r.cast("long").alias("r_score"),
            f.cast("long").alias("f_score"),
            m.cast("long").alias("m_score"),
        )
        .withColumn(
            "segment",
            F.concat_ws(
                "",
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ),
        )
        .orderBy("user_id")
    )


QUERIES = {
    "event_transition_matrix": event_transition_matrix,
    "user_rfm_segments": user_rfm_segments,
}

ORACLE = {
    "event_transition_matrix": """
        WITH pairs AS (
            SELECT lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type,
                   event_type AS next_type
            FROM events
        ),
        counted AS (
            SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
            FROM pairs WHERE prev_type IS NOT NULL
            GROUP BY prev_type, next_type
        )
        SELECT prev_type, next_type, n,
               round(n / sum(n) OVER (PARTITION BY prev_type), 6) AS p
        FROM counted
        ORDER BY prev_type, next_type
    """,
    "user_rfm_segments": f"""
        WITH per_user AS (
            SELECT user_id,
                   max(ts) AS last_ts,
                   CAST(count(*) AS BIGINT) AS frequency,
                   round(sum(value), 2) AS monetary
            FROM events GROUP BY user_id
        ),
        scored AS (
            SELECT user_id, last_ts, frequency, monetary,
                   CAST(ntile({N_TILES}) OVER (ORDER BY last_ts DESC, user_id)
                       AS BIGINT) AS r_score,
                   CAST(ntile({N_TILES}) OVER (ORDER BY frequency DESC, user_id)
                       AS BIGINT) AS f_score,
                   CAST(ntile({N_TILES}) OVER (ORDER BY monetary DESC, user_id)
                       AS BIGINT) AS m_score
            FROM per_user
        )
        SELECT user_id, last_ts, frequency, monetary, r_score, f_score, m_score,
               CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                   || CAST(m_score AS VARCHAR) AS segment
        FROM scored
        ORDER BY user_id
    """,
}
