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


CUSUM_SLACK = 0.5  # k: drift allowance in stddev units (Page's test)
CUSUM_H = 5.0  # alarm threshold in stddev units


def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's CUSUM changepoint detection per user (two-sided): alarm rows
    where the cumulative standardized drift exceeds H.

    The textbook recurrence ``S_t = max(0, S_{t-1} + z_t − k)`` looks
    sequential, but the standard identity ``S_t = cs_t − min(0, min_{j≤t}
    cs_j)`` (cs = running sum of the drift terms) turns it into a running
    sum + a running min — two window functions sharing ONE per-user sort,
    all JVM, no recursion. The per-user baseline (mean/stddev) is an
    unbounded window on the same partitioning. At 100 TB this is one
    exchange on user_id and a per-partition sort; output is alarms only,
    bounded. Upward and downward drifts are tracked symmetrically
    (S_hi on z−k, S_lo on −z−k).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    part = Window.partitionBy("user_id")
    seq = part.orderBy("ts", "event_id")
    run = seq.rowsBetween(Window.unboundedPreceding, 0)
    z = (F.col("value") - F.avg("value").over(part)) / F.stddev_samp("value").over(part)
    d = ev.select(
        "user_id",
        "ts",
        "event_id",
        (z - CUSUM_SLACK).alias("d_hi"),
        (-z - CUSUM_SLACK).alias("d_lo"),
    )
    cs = d.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("d_hi").over(run).alias("cs_hi"),
        F.sum("d_lo").over(run).alias("cs_lo"),
    )
    s = cs.select(
        "user_id",
        "event_id",
        (F.col("cs_hi") - F.least(F.lit(0.0), F.min("cs_hi").over(run))).alias("s_hi"),
        (F.col("cs_lo") - F.least(F.lit(0.0), F.min("cs_lo").over(run))).alias("s_lo"),
    )
    return s.filter((F.col("s_hi") > CUSUM_H) | (F.col("s_lo") > CUSUM_H)).select(
        "user_id",
        "event_id",
        F.round("s_hi", 4).alias("s_hi"),
        F.round("s_lo", 4).alias("s_lo"),
        F.when(F.col("s_hi") > CUSUM_H, F.lit("up")).otherwise(F.lit("down")).alias(
            "direction"
        ),
    )


HOLT_ALPHA = 0.4  # level smoothing
HOLT_BETA = 0.3  # trend smoothing
HOLT_K = 8  # truncated impulse-response terms


def _holt_weights(k: int = HOLT_K) -> tuple[list[float], list[float]]:
    """Impulse-response weights of Holt's linear method, which is a
    LINEAR time-invariant filter: with state s = [level, trend],
    s_t = A·s_{t−1} + c·x_t for A = [[1−α, 1−α], [−αβ, 1−αβ]],
    c = [α, αβ]; so s_t = Σ_j (A^j c)·x_{t−j}. Truncating at K terms
    turns the sequential recurrence into K lag() taps — the same unroll
    trick as ts_ewma, extended to the 2-state filter."""
    a, b = HOLT_ALPHA, HOLT_BETA
    A = [[1 - a, 1 - a], [-a * b, 1 - a * b]]
    vec = [a, a * b]
    wl, wb = [], []
    for _ in range(k):
        wl.append(vec[0])
        wb.append(vec[1])
        vec = [
            A[0][0] * vec[0] + A[0][1] * vec[1],
            A[1][0] * vec[0] + A[1][1] * vec[1],
        ]
    return wl, wb


def ts_holt_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing per user as a K-term truncated filter
    (zero-padded before series start — the documented semantic, like
    ts_ewma's K-term window): level and trend estimates from K lag()
    taps sharing ONE per-user sort, all JVM. Both engines evaluate the
    identical literal-weight expression shape, so per-row values are
    IEEE-identical."""
    wl, wb = _holt_weights()
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    level = F.lit(0.0)
    trend = F.lit(0.0)
    for i in range(HOLT_K):
        x = F.coalesce(F.lag("value", i).over(w), F.lit(0.0))
        level = level + x * wl[i]
        trend = trend + x * wb[i]
    return ev.select(
        "user_id",
        "event_id",
        F.round(level, 4).alias("level"),
        F.round(trend, 4).alias("trend"),
    )


def _holt_oracle_sql() -> str:
    wl, wb = _holt_weights()
    lvl = " + ".join(
        f"COALESCE(lag(value, {i}) OVER w, 0.0) * {wl[i]!r}" for i in range(HOLT_K)
    )
    trd = " + ".join(
        f"COALESCE(lag(value, {i}) OVER w, 0.0) * {wb[i]!r}" for i in range(HOLT_K)
    )
    return f"""
        SELECT user_id, event_id,
               round({lvl}, 4) AS level,
               round({trd}, 4) AS trend
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


MAD_K = 0.6745  # Φ⁻¹(0.75): scales MAD to σ-equivalents
MAD_THRESH = 3.5  # Iglewicz–Hoaglin modified z-score cutoff


def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per user via the modified z-score
    M = 0.6745·(x − median) / MAD (Iglewicz & Hoaglin 1993); |M| ≥ 3.5
    rows are flagged. Unlike ``ts_anomaly_zscore``'s mean/stddev
    baseline, median/MAD are unmoved by the outliers themselves.

    Spark-first shape: two user-keyed aggregates (median, then MAD of
    the residuals) joined back — exact interpolated ``percentile``, all
    JVM. Three shuffles total but all on user_id, so AQE coalesces them
    onto one exchange footprint; output is flagged rows only, bounded.
    Both engines interpolate even-count medians identically
    (percentile ≡ quantile_cont)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    med = ev.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(med, "user_id").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("user_id").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    scored = dev.join(mad, "user_id").withColumn(
        "m", MAD_K * (F.col("value") - F.col("med")) / F.col("mad")
    )
    return scored.filter((F.col("mad") > 0) & (F.abs("m") >= MAD_THRESH)).select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        F.round("med", 4).alias("med"),
        F.round("m", 3).alias("mscore"),
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
    "ts_cusum_changepoint": ts_cusum_changepoint,
    "ts_anomaly_mad": ts_anomaly_mad,
    "ts_holt_filter": ts_holt_filter,
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
    "ts_holt_filter": _holt_oracle_sql(),
    "ts_anomaly_mad": f"""
        WITH med AS (
            SELECT user_id, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY user_id
        ),
        dev AS (
            SELECT e.user_id, e.event_id, e.value, med.med,
                   abs(e.value - med.med) AS adev
            FROM events e JOIN med USING (user_id)
        ),
        mad AS (
            SELECT user_id, quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY user_id
        )
        SELECT d.user_id, d.event_id,
               round(d.value, 4) AS value,
               round(d.med, 4) AS med,
               round({MAD_K} * (d.value - d.med) / mad.mad, 3) AS mscore
        FROM dev d JOIN mad USING (user_id)
        WHERE mad.mad > 0
          AND abs({MAD_K} * (d.value - d.med) / mad.mad) >= {MAD_THRESH}
    """,
    "ts_cusum_changepoint": f"""
        WITH z AS (
            SELECT user_id, ts, event_id,
                   (value - avg(value) OVER p) / stddev_samp(value) OVER p AS z
            FROM events
            WINDOW p AS (PARTITION BY user_id)
        ),
        cs AS (
            SELECT user_id, ts, event_id,
                   sum(z - {CUSUM_SLACK}) OVER w AS cs_hi,
                   sum(-z - {CUSUM_SLACK}) OVER w AS cs_lo
            FROM z
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        s AS (
            SELECT user_id, event_id,
                   cs_hi - least(0.0, min(cs_hi) OVER w) AS s_hi,
                   cs_lo - least(0.0, min(cs_lo) OVER w) AS s_lo
            FROM cs
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT user_id, event_id,
               round(s_hi, 4) AS s_hi,
               round(s_lo, 4) AS s_lo,
               CASE WHEN s_hi > {CUSUM_H} THEN 'up' ELSE 'down' END AS direction
        FROM s
        WHERE s_hi > {CUSUM_H} OR s_lo > {CUSUM_H}
    """,
}
