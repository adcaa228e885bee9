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
Per-user aggregate (one shuffle on user_id), then three EXACT ntile(4)
rankings computed WITHOUT a single-reducer global sort (VERDICT r4 weak
#1 — |users| grows with the corpus, so an unpartitioned window is a
scale-killer). The distributed-exact-rank discipline, per dimension:

1. approx-quantile the sort key once (driver read, ≤ n_part boundary
   literals — the ``abc_pareto_class`` cutoff-broadcast discipline);
2. assign each row a range-bucket id from those LITERAL boundaries
   (deterministic column expression — consistent across jobs by
   construction, no repartitionByRange re-sampling hazard);
3. ``row_number`` windows partitioned BY BUCKET (parallel local sorts,
   ordered by the original column + user_id tie-break);
4. per-bucket counts to the driver (≤ n_part rows, geometry-bounded),
   cumulative offsets re-broadcast as a literal map;
5. global rank = offset + local rank, tile from rank via the exact
   ntile size formula (first N%n tiles get ceil(N/n) rows).

Boundary quality only affects partition BALANCE, never correctness —
ranks are exact for any monotone bucketing. The oracle stays the plain
``ntile(4)`` SQL and must hash-match.
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


def _exact_ntile_desc(df: DataFrame, order_col: str, score_name: str) -> DataFrame:
    """Exact ``ntile(N_TILES) OVER (ORDER BY order_col DESC, user_id)``
    without a single-reducer sort (module docstring, steps 1–5). The
    bucket id is computed from approx-quantile boundaries captured as
    literals, so the counts job and the rank job agree by construction;
    the in-bucket window orders by the ORIGINAL column (the double cast
    is used only for monotone bucketing, so timestamp precision cannot
    perturb the tie-break)."""
    spark = df.sparkSession
    n_part = max(2, int(spark.conf.get("spark.sql.shuffle.partitions")))
    dtype = dict(df.dtypes)[order_col]
    key = (
        F.unix_micros(F.col(order_col).cast("timestamp")).cast("double")
        if dtype.startswith("timestamp")
        else F.col(order_col).cast("double")
    )
    keyed = df.withColumn("_key", key)
    probs = [i / n_part for i in range(1, n_part)]
    bounds = sorted(set(keyed.stat.approxQuantile("_key", probs, 0.01)))
    # descending rank order: bucket 0 holds the largest keys; equal keys
    # always share a bucket, so the user_id tie-break stays in-bucket
    pid = F.lit(0)
    for b in bounds:
        pid = pid + F.when(F.col("_key") < F.lit(b), 1).otherwise(0)
    w = Window.partitionBy("_pid").orderBy(F.col(order_col).desc(), "user_id")
    ranked = (
        keyed.withColumn("_pid", pid)
        .withColumn("_lrank", F.row_number().over(w).cast("long"))
    )
    counts = {
        r["_pid"]: r["n"]
        for r in ranked.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    total, acc, offsets = sum(counts.values()), 0, {}
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    off_map = F.create_map(
        *[F.lit(x) for p in sorted(offsets) for x in (p, offsets[p])]
    )
    rank = (off_map[F.col("_pid")] + F.col("_lrank")).cast("long")
    q, rem = divmod(total, N_TILES)
    if q == 0:  # fewer rows than tiles: ntile assigns rank itself
        tile = rank
    else:
        boundary = rem * (q + 1)
        tile = F.when(
            rank <= boundary, F.floor((rank + q) / (q + 1))
        ).otherwise(rem + F.floor((rank - boundary + q - 1) / q))
    return ranked.withColumn(score_name, tile.cast("long")).drop(
        "_key", "_pid", "_lrank"
    )


def user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user RFM quartiles: recency (latest event first), frequency,
    monetary — each an exact distributed ntile(4) with user_id tie-break
    (no global sort; module docstring); segment = 'rfm'."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").cast("long").alias("frequency"),
        F.round(F.sum("value"), 2).alias("monetary"),
    ).localCheckpoint()  # one events pass shared by the three rankings
    scored = _exact_ntile_desc(per_user, "last_ts", "r_score")
    scored = _exact_ntile_desc(scored, "frequency", "f_score")
    scored = _exact_ntile_desc(scored, "monetary", "m_score")
    return (
        scored.select(
            "user_id", "last_ts", "frequency", "monetary",
            "r_score", "f_score", "m_score",
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


def olap_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each ``purchase`` event's value
    is credited to the user's most recent preceding non-purchase event
    type (the "channel"); purchases with no preceding touch go to
    ``direct``. The canonical attribution query every event-analytics
    stack ships (GA/Amplitude last-touch model).

    Shape: ONE shuffle on user_id for the carry-forward window
    (``last(..., ignorenulls=True)`` over rows-unbounded-preceding — the
    same LOCF discipline as ``ts_gapfill_locf``), then a channel
    aggregate whose output is bounded by |event_type|, corpus-invariant.
    Purchase values are summed as DECIMAL so the credit totals are
    exact and associative (fp addition order cannot flip the rounded
    cent between engines at any scale).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touched = ev.select(
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("value"),
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w).alias("channel"),
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .withColumn("channel", F.coalesce("channel", F.lit("direct")))
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.round(F.sum("value"), 2).cast("double").alias("attributed_value"),
        )
        .orderBy("channel")
    )


def olap_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) attribution — the multi-touch companion
    of ``olap_attribution_last_touch``: each converting purchase credits
    40% of its value to the journey's first touch, 40% to its last, and
    splits the remaining 20% equally across the middles (1 touch → 100%,
    2 touches → 50/50, 0 touches → ``direct``).

    Join-free journey segmentation: a journey is every event up to and
    including the user's next purchase, identified by the running count
    of PRIOR purchases — so each touch belongs to exactly one journey and
    the purchase is its journey's last row by construction. Everything is
    windows over ONE user_id shuffle (the sessionization partitioning) +
    a |channel|-bounded aggregate: no purchase×touch join, no fan-out.
    Credits are IEEE doubles; only the final channel sum is rounded (2 dp).
    """
    ev = load_table(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    j = ev.select(
        "event_type",
        "value",
        F.coalesce(
            F.sum(is_p.cast("long")).over(
                wu.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("jid"),
        "user_id",
        "ts",
        "event_id",
    )
    wj = Window.partitionBy("user_id", "jid")
    scored = j.select(
        "event_type",
        F.row_number().over(wj.orderBy("ts", "event_id")).alias("rn"),
        F.sum((~is_p).cast("long")).over(wj).alias("k"),
        F.max(F.when(is_p, F.col("value"))).over(wj).alias("pv"),
    )
    credit = (
        F.when((F.col("event_type") == "purchase") & (F.col("k") == 0), F.col("pv"))
        .when(F.col("event_type") == "purchase", F.lit(None))
        .when(F.col("pv").isNull(), F.lit(None))  # journey never converted
        .when(F.col("k") == 1, F.col("pv"))
        .when(F.col("k") == 2, F.col("pv") / 2.0)
        .when(
            (F.col("rn") == 1) | (F.col("rn") == F.col("k")), 0.4 * F.col("pv")
        )
        .otherwise(0.2 * F.col("pv") / (F.col("k") - 2))
    )
    return (
        scored.select(
            F.when(F.col("event_type") == "purchase", F.lit("direct"))
            .otherwise(F.col("event_type"))
            .alias("channel"),
            credit.alias("credit"),
        )
        .filter(F.col("credit").isNotNull())
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_credited"),
            F.round(F.sum("credit"), 2).alias("attributed_value"),
        )
        .orderBy("channel")
    )


QUERIES = {
    "event_transition_matrix": event_transition_matrix,
    "user_rfm_segments": user_rfm_segments,
    "olap_attribution_last_touch": olap_attribution_last_touch,
    "olap_attribution_position": olap_attribution_position,
}

_ATTRIB_POSITION_SQL = """
    WITH j AS (
        SELECT event_type, value, user_id, ts, event_id,
               coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS jid
        FROM events
    ),
    scored AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY user_id, jid
                                  ORDER BY ts, event_id) AS rn,
               sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id, jid) AS k,
               max(CASE WHEN event_type = 'purchase' THEN value END)
                   OVER (PARTITION BY user_id, jid) AS pv
        FROM j
    ),
    credited AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 'direct'
                    ELSE event_type END AS channel,
               CASE WHEN event_type = 'purchase' AND k = 0 THEN pv
                    WHEN event_type = 'purchase' THEN NULL
                    WHEN pv IS NULL THEN NULL
                    WHEN k = 1 THEN pv
                    WHEN k = 2 THEN pv / 2.0
                    WHEN rn = 1 OR rn = k THEN 0.4 * pv
                    ELSE 0.2 * pv / (k - 2) END AS credit
        FROM scored
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_credited,
           round(sum(credit), 2) AS attributed_value
    FROM credited
    WHERE credit IS NOT NULL
    GROUP BY channel
    ORDER BY channel
"""

ORACLE = {
    "olap_attribution_position": _ATTRIB_POSITION_SQL,
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
    "olap_attribution_last_touch": """
        WITH touched AS (
            SELECT event_type,
                   CAST(value AS DECIMAL(18,6)) AS value,
                   last_value(
                       CASE WHEN event_type <> 'purchase' THEN event_type END
                       IGNORE NULLS
                   ) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS channel
            FROM events
        )
        SELECT coalesce(channel, 'direct') AS channel,
               CAST(count(*) AS BIGINT) AS n_purchases,
               CAST(round(sum(value), 2) AS DOUBLE) AS attributed_value
        FROM touched
        WHERE event_type = 'purchase'
        GROUP BY 1
        ORDER BY 1
    """,
}
