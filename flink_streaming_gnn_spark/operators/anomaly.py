"""Timeseries smoothing + anomaly scoring over the event stream
(SURVEY.md §2A A15 metrics family: the reference's throughput/latency
sinks feed exactly these detectors; batch twins of per-key streaming
state machines).

* ``ts_ewma`` — windowed exponentially-weighted moving average per user:
  ``ewma_t = Σ_{i=0..K-1} α(1-α)^i · x_{t-i}``, renormalized over the
  weights actually present so the first K-1 rows are well-defined. The
  K-term recurrence unrolls into K ``lag()`` calls sharing ONE window
  spec — a single per-user sort, all JVM. (The infinite-memory EWMA is
  the streaming keyed-state fold in ``streaming/stateful.py`` — same
  math, state carries the tail; this is its bounded batch twin.)
* ``ts_anomaly_zscore`` — trailing-window z-score: each event scored
  against the mean/stddev of its preceding ROWS window (current row
  excluded — the detector must not contaminate its own baseline);
  |z| ≥ 3 rows are flagged. Output keeps only flagged rows, bounded.

Both ride one hash-partitioned sort per user (two window functions share
the frame); no Python, no extra exchange. At 100 TB user_id partitions
the sort — skewed users cost one partition's sort, and the K-lag unroll
keeps memory at O(K) per row group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_streaming_gnn_spark.sources.tables import load_table

ALPHA = 0.3
K = 8  # EWMA window terms
Z_WIN = 20  # trailing rows for the z-score baseline
Z_MIN_N = 10  # minimum baseline rows before scoring
Z_THRESH = 3.0


def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for i in range(K):
        weight = ALPHA * (1 - ALPHA) ** i
        x = F.lag("value", i).over(w)
        num = num + F.when(x.isNotNull(), x * weight).otherwise(0.0)
        den = den + F.when(x.isNotNull(), F.lit(weight)).otherwise(0.0)
    return ev.select(
        "user_id",
        "event_id",
        F.round((num / den), 4).alias("ewma"),
    )


def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    base = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-Z_WIN, -1)
    )
    scored = ev.select(
        "user_id",
        "event_id",
        "value",
        F.avg("value").over(base).alias("mu"),
        F.stddev_samp("value").over(base).alias("sigma"),
        F.count("value").over(base).alias("n_base"),
    )
    return (
        scored.filter(
            (F.col("n_base") >= Z_MIN_N)
            & (F.col("sigma") > 0)
            & (F.abs((F.col("value") - F.col("mu")) / F.col("sigma")) >= Z_THRESH)
        )
        .select(
            "user_id",
            "event_id",
            F.round("value", 4).alias("value"),
            F.round("mu", 4).alias("mu"),
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 3).alias("z"),
        )
    )


def _ewma_oracle_sql() -> str:
    num_terms, den_terms = [], []
    for i in range(K):
        weight = ALPHA * (1 - ALPHA) ** i
        lag = f"lag(value, {i}) OVER w"
        num_terms.append(f"COALESCE({lag} * {weight!r}, 0.0)")
        den_terms.append(f"CASE WHEN {lag} IS NOT NULL THEN {weight!r} ELSE 0.0 END")
    num = " + ".join(num_terms)
    den = " + ".join(den_terms)
    return f"""
        SELECT user_id, event_id,
               round(({num}) / ({den}), 4) AS ewma
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


QUERIES = {
    "ts_ewma": ts_ewma,
    "ts_anomaly_zscore": ts_anomaly_zscore,
}

ORACLE = {
    "ts_ewma": _ewma_oracle_sql(),
    "ts_anomaly_zscore": f"""
        WITH scored AS (
            SELECT user_id, event_id, value,
                   avg(value) OVER w AS mu,
                   stddev_samp(value) OVER w AS sigma,
                   count(value) OVER w AS n_base
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN {Z_WIN} PRECEDING AND 1 PRECEDING)
        )
        SELECT user_id, event_id,
               round(value, 4) AS value,
               round(mu, 4) AS mu,
               round((value - mu) / sigma, 3) AS z
        FROM scored
        WHERE n_base >= {Z_MIN_N} AND sigma > 0
          AND abs((value - mu) / sigma) >= {Z_THRESH}
    """,
}
