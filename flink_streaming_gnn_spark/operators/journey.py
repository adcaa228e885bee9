"""Funnel latency analytics (SURVEY.md §2B analytics family, the timing
companion of ``funnel_conversion``): time-to-convert between adjacent
funnel stages — for each user who reached stage k+1 after first touching
stage k, the distribution of the wait (median / p90 / mean seconds).
This is the "how long does conversion take?" query every funnel
dashboard pairs with the count funnel.

Spark-first shape: ONE distributed aggregation collapses events to a
per-user row of first-touch timestamps (conditional ``min`` per stage —
no self-join per stage pair), then a ``stack`` unpivot to (pair, delta)
rows and a |stages|-bounded exact-percentile aggregate. The percentile
pair (Spark exact interpolated ``percentile`` ≡ DuckDB
``quantile_cont``) is the ``agg_percentile`` discipline.

Deltas are microsecond-integer differences scaled to seconds (one exact
subtraction + one division by 1e6 — deterministic IEEE on both
engines); only the final mean is rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

STAGES = ["signup", "view", "click", "purchase"]


def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
            for s in STAGES
        ]
    )
    pair_cols = []
    for a, b in zip(STAGES, STAGES[1:]):
        delta = (
            F.unix_micros(F.col(f"t_{b}").cast("timestamp"))
            - F.unix_micros(F.col(f"t_{a}").cast("timestamp"))
        ) / F.lit(1e6)
        pair_cols.append(
            F.when(
                F.col(f"t_{a}").isNotNull()
                & F.col(f"t_{b}").isNotNull()
                & (F.col(f"t_{b}") > F.col(f"t_{a}")),
                F.struct(
                    F.lit(f"{a}->{b}").alias("pair"), delta.alias("delta_sec")
                ),
            )
        )
    deltas = (
        firsts.select(F.explode(F.array(*pair_cols)).alias("pd"))
        .filter(F.col("pd").isNotNull())
        .select("pd.pair", "pd.delta_sec")
    )
    return (
        deltas.groupBy("pair")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.round(F.percentile("delta_sec", F.lit(0.5)), 6).alias("median_sec"),
            F.round(F.percentile("delta_sec", F.lit(0.9)), 6).alias("p90_sec"),
            F.round(F.avg("delta_sec"), 6).alias("mean_sec"),
        )
        .orderBy("pair")
    )


def _ttc_oracle() -> str:
    firsts = ",\n               ".join(
        f"min(CASE WHEN event_type = '{s}' THEN ts END) AS t_{s}"
        for s in STAGES
    )
    pairs = " UNION ALL ".join(
        f"""
        SELECT '{a}->{b}' AS pair,
               (epoch_us(t_{b}) - epoch_us(t_{a})) / 1e6 AS delta_sec
        FROM firsts
        WHERE t_{a} IS NOT NULL AND t_{b} IS NOT NULL AND t_{b} > t_{a}
        """
        for a, b in zip(STAGES, STAGES[1:])
    )
    return f"""
        WITH firsts AS (
            SELECT user_id,
               {firsts}
            FROM events GROUP BY user_id
        ),
        deltas AS ({pairs})
        SELECT pair,
               CAST(count(*) AS BIGINT) AS n_users,
               round(quantile_cont(delta_sec, 0.5), 6) AS median_sec,
               round(quantile_cont(delta_sec, 0.9), 6) AS p90_sec,
               round(avg(delta_sec), 6) AS mean_sec
        FROM deltas
        GROUP BY pair
        ORDER BY pair
    """


QUERIES = {"funnel_time_to_convert": funnel_time_to_convert}
ORACLE = {"funnel_time_to_convert": _ttc_oracle()}
