"""Rolling-band / momentum indicators over the daily demand series
(SURVEY.md §2B timeseries family, next to ``ts_ewma`` / ``ts_holt_filter``
/ ``ts_anomaly_zscore``): Bollinger bands and the RSI — the two most
common "is today unusual?" transforms a monitoring pipeline layers on a
downsampled series.

* ``ts_bollinger_bands`` — 7-day rolling mean ± 2·stddev_samp of daily
  total quantity shipped, emitted only once the window is full, with a
  breakout flag. The flag compares the integer daily value against the
  ROUNDED band (4 dp), so both engines evaluate the comparison on
  identical numbers — a float-boundary flip cannot split the engines.
* ``ts_rsi`` — 14-day RSI on the daily-quantity deltas, in the
  single-division form RSI = 100·Σgain / (Σgain + Σloss) (algebraically
  identical to 100 − 100/(1+RS) but with one rounding site and exact
  integer numerators). All-flat windows (Σgain+Σloss = 0) pin RSI = 50.

Scale shape: ONE distributed aggregation collapses the fact table to
the |days|-sized series (calendar-bounded — the ``abc_pareto``
discipline); the rolling windows then run over ≤ a few thousand rows.
Daily quantities are exact-integer sums, so every input to the rolling
math is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

BOLL_N = 7
RSI_N = 14


def _daily_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # date_trunc keeps TIMESTAMP on both engines (DATE round-trips through
    # pandas with different string forms — the repo-wide discipline).
    return li.groupBy(F.date_trunc("day", "l_shipdate").alias("day")).agg(
        F.sum("l_quantity").cast("long").alias("qty")
    )


def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_qty(spark, sf_dir)
    w = Window.orderBy("day").rowsBetween(-(BOLL_N - 1), Window.currentRow)
    upper = F.round(F.avg("qty").over(w) + 2.0 * F.stddev_samp("qty").over(w), 4)
    lower = F.round(F.avg("qty").over(w) - 2.0 * F.stddev_samp("qty").over(w), 4)
    return (
        daily.select(
            "day",
            "qty",
            F.count("*").over(w).alias("_n"),
            F.round(F.avg("qty").over(w), 4).alias("ma"),
            upper.alias("upper_band"),
            lower.alias("lower_band"),
        )
        .filter(F.col("_n") == BOLL_N)
        .drop("_n")
        .withColumn(
            "breakout",
            F.when(F.col("qty") > F.col("upper_band"), F.lit("up"))
            .when(F.col("qty") < F.col("lower_band"), F.lit("down"))
            .otherwise(F.lit("in_band")),
        )
        .orderBy("day")
    )


def ts_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_qty(spark, sf_dir)
    wl = Window.orderBy("day")
    delta = (F.col("qty") - F.lag("qty").over(wl)).alias("delta")
    deltas = daily.select("day", "qty", delta).filter(F.col("delta").isNotNull())
    w = Window.orderBy("day").rowsBetween(-(RSI_N - 1), Window.currentRow)
    sg = F.sum(F.greatest(F.col("delta"), F.lit(0))).over(w)
    sl = F.sum(F.greatest(-F.col("delta"), F.lit(0))).over(w)
    return (
        deltas.select(
            "day",
            "qty",
            "delta",
            F.count("*").over(w).alias("_n"),
            sg.alias("_sg"),
            sl.alias("_sl"),
        )
        .filter(F.col("_n") == RSI_N)
        .select(
            "day",
            "qty",
            "delta",
            F.when(F.col("_sg") + F.col("_sl") == 0, F.lit(50.0))
            .otherwise(
                F.round(100.0 * F.col("_sg") / (F.col("_sg") + F.col("_sl")), 6)
            )
            .alias("rsi"),
        )
        .orderBy("day")
    )


QUERIES = {
    "ts_bollinger_bands": ts_bollinger_bands,
    "ts_rsi": ts_rsi,
}

_DAILY_CTE = """
    daily AS (
        SELECT date_trunc('day', l_shipdate) AS day,
               CAST(sum(l_quantity) AS BIGINT) AS qty
        FROM lineitem GROUP BY 1
    )
"""

ORACLE = {
    "ts_bollinger_bands": f"""
        WITH {_DAILY_CTE},
        rolled AS (
            SELECT day, qty,
                   count(*) OVER w AS n,
                   round(avg(qty) OVER w, 4) AS ma,
                   round(avg(qty) OVER w
                         + 2.0 * stddev_samp(qty) OVER w, 4) AS upper_band,
                   round(avg(qty) OVER w
                         - 2.0 * stddev_samp(qty) OVER w, 4) AS lower_band
            FROM daily
            WINDOW w AS (ORDER BY day
                         ROWS BETWEEN {BOLL_N - 1} PRECEDING AND CURRENT ROW)
        )
        SELECT day, qty, ma, upper_band, lower_band,
               CASE WHEN qty > upper_band THEN 'up'
                    WHEN qty < lower_band THEN 'down'
                    ELSE 'in_band' END AS breakout
        FROM rolled WHERE n = {BOLL_N}
        ORDER BY day
    """,
    "ts_rsi": f"""
        WITH {_DAILY_CTE},
        deltas AS (
            SELECT day, qty,
                   qty - lag(qty) OVER (ORDER BY day) AS delta
            FROM daily
        ),
        rolled AS (
            SELECT day, qty, delta,
                   count(*) OVER w AS n,
                   sum(greatest(delta, 0)) OVER w AS sg,
                   sum(greatest(-delta, 0)) OVER w AS sl
            FROM deltas WHERE delta IS NOT NULL
            WINDOW w AS (ORDER BY day
                         ROWS BETWEEN {RSI_N - 1} PRECEDING AND CURRENT ROW)
        )
        SELECT day, qty, delta,
               CASE WHEN sg + sl = 0 THEN 50.0
                    ELSE round(100.0 * sg / (sg + sl), 6) END AS rsi
        FROM rolled WHERE n = {RSI_N}
        ORDER BY day
    """,
}


HW_ALPHA, HW_BETA, HW_GAMMA = 0.3, 0.1, 0.2
HW_PERIOD = 7  # weekly seasonality on the daily series
HW_K = 28  # truncation: 4 seasonal periods of taps


def _hw_weights(k: int = HW_K):
    """Holt–Winters additive smoothing as a truncated linear filter (the
    ``ts_holt_filter`` unroll lifted to the (m+2)-state seasonal system):
    state (l, b, s_t..s_{t−m+1}) follows state_t = A·state_{t−1} + c·x_t,
    so level/trend/season are Σ_j (A^j c)[i]·x_{t−j}. Returns the three
    literal weight lists both engines embed verbatim."""
    a, b, g, m = HW_ALPHA, HW_BETA, HW_GAMMA, HW_PERIOD
    dim = m + 2
    A = [[0.0] * dim for _ in range(dim)]
    # l_t
    A[0][0] = 1 - a
    A[0][1] = 1 - a
    A[0][2 + m - 1] = -a
    # b_t
    A[1][0] = -b * a
    A[1][1] = 1 - b * a
    A[1][2 + m - 1] = -b * a
    # s_t
    A[2][0] = -g * (1 - a)
    A[2][1] = -g * (1 - a)
    A[2][2 + m - 1] = g * a + 1 - g
    # seasonal shift register s_{t−k} = prev s_{t−k+1}
    for j in range(1, m):
        A[2 + j][2 + j - 1] = 1.0
    vec = [a, b * a, g * (1 - a)] + [0.0] * (m - 1)
    wl, wb, ws = [], [], []
    for _ in range(k):
        wl.append(vec[0])
        wb.append(vec[1])
        ws.append(vec[2])
        vec = [sum(A[i][j] * vec[j] for j in range(dim)) for i in range(dim)]
    return wl, wb, ws


def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt–Winters additive level/trend/seasonal smoothing of the daily
    quantity series as a K-term truncated filter (zero-padded before the
    series start — the ``ts_holt_filter`` documented semantic): all
    three state estimates from K ``lag()`` taps sharing ONE ordered
    window over the calendar-bounded series. Both engines evaluate the
    identical literal-weight tap chain on exact-integer daily inputs, so
    per-row values are IEEE-identical before the display rounding."""
    wl, wb, ws = _hw_weights()
    daily = _daily_qty(spark, sf_dir)
    w = Window.orderBy("day")
    level = F.lit(0.0)
    trend = F.lit(0.0)
    season = F.lit(0.0)
    for i in range(HW_K):
        x = F.coalesce(F.lag("qty", i).over(w).cast("double"), F.lit(0.0))
        level = level + x * wl[i]
        trend = trend + x * wb[i]
        season = season + x * ws[i]
    return daily.select(
        "day",
        "qty",
        F.round(level, 4).alias("level"),
        F.round(trend, 4).alias("trend"),
        F.round(season, 4).alias("seasonal"),
    ).orderBy("day")


def _hw_oracle() -> str:
    wl, wb, ws = _hw_weights()

    def taps(weights: list[float]) -> str:
        return " + ".join(
            f"COALESCE(CAST(lag(qty, {i}) OVER w AS DOUBLE), 0.0) * {weights[i]!r}"
            for i in range(HW_K)
        )

    return f"""
        WITH {_DAILY_CTE}
        SELECT day, qty,
               round({taps(wl)}, 4) AS level,
               round({taps(wb)}, 4) AS trend,
               round({taps(ws)}, 4) AS seasonal
        FROM daily
        WINDOW w AS (ORDER BY day)
        ORDER BY day
    """


QUERIES["ts_holt_winters"] = ts_holt_winters
ORACLE["ts_holt_winters"] = _hw_oracle()
