"""Complex-event-processing pattern operators (SURVEY.md §2A A1/A16 —
the reference runs on Flink, whose flagship event-pattern surface is
FlinkCEP / SQL MATCH_RECOGNIZE; these are the relational re-expressions
of its two canonical shapes):

* ``cep_window_funnel`` — funnel-within-window (FlinkCEP's
  ``A next B next C within(1h)`` / ClickHouse ``windowFunnel``): per
  user, the deepest view→click→purchase chain where every later stage
  lands strictly after the previous one and inside ONE hour of the
  chain's starting view. Greedy earliest-next chaining is optimal for
  depth (exchange argument: replacing any chosen stage event by the
  earliest feasible one never invalidates later stages), so the chain
  is a pure function of the event set — no backtracking automaton
  needed.
* ``cep_pattern_vshape`` — MATCH_RECOGNIZE-style shape detection
  (``PATTERN (DOWN DOWN UP)``): per user, count runs of four
  consecutive events whose values go strictly down, down, then up —
  the V-shape dip-recovery motif — plus when the first one happened.

Spark-first shape: both operators ride ONE user_id exchange. The funnel
uses two conditional ``min`` window functions over the range frame
``RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING`` on the integer
microsecond timeline (strictly-after semantics exact even under tied
timestamps, where a rows-frame would be peer-order dependent): each
event row learns the earliest strictly-later click and purchase. Chain
assembly is then a single equi self-join from each start row to its
chosen click row (to read that row's next-purchase), never a theta
join. The V-shape is three ``lead`` calls on the same partitioning.

At 100 TB both plans stay shuffle-minimal: one exchange on user_id
reused by every window, one equi-join keyed on (user_id, ts) whose
build side is the click subset, aggregates map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

WINDOW_US = 3_600_000_000  # 1 hour in microseconds
STAGES = ("view", "click", "purchase")


def cep_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        # NTZ → UTC-pinned timestamp (session tz is UTC) for exact integer µs
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_type",
    )
    # every event learns the earliest STRICTLY-later click / purchase of
    # its user — one exchange, two conditional mins on the same frame
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    nxt = ev.select(
        "user_id",
        "us",
        "event_type",
        F.min(F.when(F.col("event_type") == STAGES[1], F.col("us"))).over(w).alias("nc"),
        F.min(F.when(F.col("event_type") == STAGES[2], F.col("us"))).over(w).alias("np"),
    )
    starts = nxt.filter(F.col("event_type") == STAGES[0]).select(
        "user_id",
        F.col("us").alias("t1"),
        F.when(F.col("nc") <= F.col("us") + WINDOW_US, F.col("nc")).alias("t2"),
    )
    # read the chosen click row's next-purchase (distinct on the join key:
    # tied-timestamp clicks share the identical frame, hence identical np)
    clicks = nxt.filter(F.col("event_type") == STAGES[1]).select(
        "user_id", F.col("us").alias("t2"), "np"
    ).distinct()
    chains = starts.join(clicks, ["user_id", "t2"], "left").select(
        "user_id",
        "t1",
        "t2",
        F.when(F.col("np") <= F.col("t1") + WINDOW_US, F.col("np")).alias("t3"),
    )
    depth = (
        F.lit(1)
        + F.col("t2").isNotNull().cast("int")
        + (F.col("t2").isNotNull() & F.col("t3").isNotNull()).cast("int")
    )
    return (
        chains.select("user_id", depth.alias("depth"))
        .groupBy("user_id")
        .agg(
            F.max("depth").cast("int").alias("max_depth"),
            F.sum((F.col("depth") == 3).cast("long")).cast("long").alias("n_full"),
        )
        .orderBy("user_id")
    )


def cep_pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    laid = ev.select(
        "user_id",
        "ts",
        "value",
        F.lead("value", 1).over(w).alias("v1"),
        F.lead("value", 2).over(w).alias("v2"),
        F.lead("value", 3).over(w).alias("v3"),
    )
    is_match = (
        (F.col("v1") < F.col("value"))
        & (F.col("v2") < F.col("v1"))
        & (F.col("v3") > F.col("v2"))
    )
    return (
        laid.filter(is_match)
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_matches"),
            F.min("ts").alias("first_match_ts"),
        )
        .orderBy("user_id")
    )


def cep_absence_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABSENCE detection — FlinkCEP's ``notFollowedBy`` with a timeout,
    the "abandoned cart": a view with NO purchase strictly inside the
    next hour ((t, t+W] on the integer µs timeline). The third canonical
    CEP shape next to the funnel (sequence) and the V (value pattern).

    Same one-exchange discipline as ``cep_window_funnel``: each view row
    learns its user's earliest strictly-later purchase via one
    conditional ``min`` over the RANGE 1..∞ frame; abandoned ⟺ that
    purchase is missing or lands past the deadline. Batch semantics at
    the data's edge: a view with no later purchase at all counts as
    abandoned (a streaming twin would hold it until the watermark passes
    t+W — the ``stream_tumbling_append_e2e`` withheld-tail discipline).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_type",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    views = (
        ev.select(
            "user_id",
            "us",
            "event_type",
            F.min(
                F.when(F.col("event_type") == STAGES[2], F.col("us"))
            ).over(w).alias("np"),
        )
        .filter(F.col("event_type") == STAGES[0])
        .withColumn(
            "abandoned",
            F.col("np").isNull() | (F.col("np") > F.col("us") + WINDOW_US),
        )
    )
    return (
        views.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_views"),
            F.sum(F.col("abandoned").cast("long")).cast("long").alias("n_abandoned"),
            F.round(
                F.sum(F.col("abandoned").cast("long")) / F.count("*"), 4
            ).alias("abandon_rate"),
            F.min(F.when(F.col("abandoned"), F.col("us"))).alias("first_abandoned_us"),
        )
        .orderBy("user_id")
    )


QUERIES = {
    "cep_window_funnel": cep_window_funnel,
    "cep_pattern_vshape": cep_pattern_vshape,
    "cep_absence_timeout": cep_absence_timeout,
}

ORACLE = {
    "cep_window_funnel": f"""
        WITH ev AS (
            SELECT user_id,
                   epoch_us(ts) AS us,
                   event_type
            FROM events
        ),
        nxt AS (
            SELECT user_id, us, event_type,
                   min(CASE WHEN event_type = '{STAGES[1]}' THEN us END) OVER w AS nc,
                   min(CASE WHEN event_type = '{STAGES[2]}' THEN us END) OVER w AS np
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY us
                         RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        ),
        starts AS (
            SELECT user_id, us AS t1,
                   CASE WHEN nc <= us + {WINDOW_US} THEN nc END AS t2
            FROM nxt WHERE event_type = '{STAGES[0]}'
        ),
        clicks AS (
            SELECT DISTINCT user_id, us AS t2, np
            FROM nxt WHERE event_type = '{STAGES[1]}'
        ),
        chains AS (
            SELECT s.user_id, s.t1, s.t2,
                   CASE WHEN c.np <= s.t1 + {WINDOW_US} THEN c.np END AS t3
            FROM starts s LEFT JOIN clicks c
              ON c.user_id = s.user_id AND c.t2 = s.t2
        )
        SELECT user_id,
               CAST(max(1 + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
                          + CASE WHEN t2 IS NOT NULL AND t3 IS NOT NULL
                                 THEN 1 ELSE 0 END) AS INTEGER) AS max_depth,
               CAST(sum(CASE WHEN t2 IS NOT NULL AND t3 IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_full
        FROM chains
        GROUP BY user_id
        ORDER BY user_id
    """,
    "cep_absence_timeout": f"""
        WITH ev AS (
            SELECT user_id, epoch_us(ts) AS us, event_type FROM events
        ),
        nxt AS (
            SELECT user_id, us, event_type,
                   min(CASE WHEN event_type = '{STAGES[2]}' THEN us END) OVER w AS np
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY us
                         RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        ),
        views AS (
            SELECT user_id, us,
                   (np IS NULL OR np > us + {WINDOW_US}) AS abandoned
            FROM nxt WHERE event_type = '{STAGES[0]}'
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_views,
               CAST(sum(CASE WHEN abandoned THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_abandoned,
               round(sum(CASE WHEN abandoned THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 4) AS abandon_rate,
               min(CASE WHEN abandoned THEN us END) AS first_abandoned_us
        FROM views
        GROUP BY user_id
        ORDER BY user_id
    """,
    "cep_pattern_vshape": """
        WITH laid AS (
            SELECT user_id, ts, value,
                   lead(value, 1) OVER w AS v1,
                   lead(value, 2) OVER w AS v2,
                   lead(value, 3) OVER w AS v3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_matches,
               min(ts) AS first_match_ts
        FROM laid
        WHERE v1 < value AND v2 < v1 AND v3 > v2
        GROUP BY user_id
        ORDER BY user_id
    """,
}
