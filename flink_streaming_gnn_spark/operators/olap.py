"""OLAP aggregate extensions: MODE (most-frequent value per group) and a
fixed-width histogram (SURVEY.md §2B aggregations — the two standard
profiling aggregates next to percentiles/corr that every warehouse layer
exposes).

* ``agg_mode`` — most frequent event_type per user, deterministic
  lexicographic tiebreak: count agg → WindowGroupLimit rank-1. Two
  shuffles total (one on (user, type), one on user), both mergeable.
* ``agg_histogram`` — 10-bin equi-width histogram of order totals; the
  [min, max] domain is a 1-row broadcast aggregate (no driver collect),
  binning is pure JVM arithmetic riding the scan, then one count agg on
  the bin id. The mergeable-sketch alternative for streaming is
  ``agg_approx_quantile``.

At 100 TB: mode's first agg absorbs hot users map-side; the histogram's
second pass shuffles only (bin, partial count) — 10 rows per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_streaming_gnn_spark.sources.tables import load_table

N_BINS = 10


def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
    )


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    dom = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    step = (F.col("hi") - F.col("lo")) / N_BINS
    binned = o.crossJoin(F.broadcast(dom)).select(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("lo")) / step),
            F.lit(N_BINS - 1),
        )
        .cast("long")
        .alias("bin"),
        F.round(F.col("lo") + step * F.least(
            F.floor((F.col("o_totalprice") - F.col("lo")) / step),
            F.lit(N_BINS - 1),
        ), 2).alias("bin_lo"),
    )
    return binned.groupBy("bin", "bin_lo").agg(
        F.count("*").cast("long").alias("n")
    )


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (status, priority) with GROUPING_ID — the third
    member of the multi-grouping family (grouping sets: agg_grouping_sets;
    ROLLUP: rollup_hypertable_events). One Expand + one hash agg pass:
    Spark expands each input row into the 4 cube cells map-side, partial
    aggregation collapses them before the (tiny, cell-count-bounded)
    shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


def olap_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth — the standard
    reporting comparison: revenue per order month, with MoM delta/percent
    via lag(1) and YoY percent via lag(12) over the month series. One
    distributed month aggregation; the lag windows run over the
    |months|-sized series (bounded by the calendar, not the data — the
    abc_pareto single-reducer discipline). Percentages rounded to 4 dp;
     6-year fixture range ⇒ both lags populated for most rows."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue", 1).over(w)
    yoy = F.lag("revenue", 12).over(w)
    return monthly.select(
        "month",
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("mom_delta"),
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias("mom_pct"),
        F.round((F.col("revenue") - yoy) / yoy * 100, 4).alias("yoy_pct"),
    ).orderBy("month")


def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness/kurtosis per event type from raw power sums — the
    one-pass mergeable-moment formulation (s₁..s₄ partial-aggregate and
    combine, the distributed-statistics textbook shape), with the
    central-moment algebra applied AFTER the aggregate:

        m_k = E[(x−μ)^k] expanded in raw moments; g1 = m3/m2^1.5,
        g2 = m4/m2² − 3.

    Built-in skewness()/kurtosis() are deliberately avoided: engines
    disagree on population-vs-sample corrections, while raw power sums
    are engine-neutral (identical expression shapes both sides, powers
    as explicit multiply chains — pow()'s libm path need not be
    bit-stable across engines). One exchange of 5 doubles per group."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("value")
    wide = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    mean = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mean * mean
    m3 = (
        F.col("s3") / F.col("n")
        - 3 * mean * (F.col("s2") / F.col("n"))
        + 2 * mean * mean * mean
    )
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mean * (F.col("s3") / F.col("n"))
        + 6 * mean * mean * (F.col("s2") / F.col("n"))
        - 3 * mean * mean * mean * mean
    )
    return wide.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(mean, 6).alias("mean"),
        F.round(m2, 6).alias("m2"),
        F.round(m3 / (m2 ** F.lit(1.5)), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3.0, 6).alias("excess_kurtosis"),
    ).orderBy("event_type")


_MOMENTS_SQL = """
    WITH wide AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS n,
               sum(value) AS s1,
               sum(value * value) AS s2,
               sum(value * value * value) AS s3,
               sum(value * value * value * value) AS s4
        FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           round(s1 / n, 6) AS mean,
           round(s2 / n - (s1 / n) * (s1 / n), 6) AS m2,
           round((s3 / n - 3 * (s1 / n) * (s2 / n)
                  + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skewness,
           round((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n))
                    * (s2 / n - (s1 / n) * (s1 / n))) - 3.0, 6)
               AS excess_kurtosis
    FROM wide ORDER BY event_type
"""


QUERIES = {
    "agg_mode": agg_mode,
    "agg_histogram": agg_histogram,
    "agg_cube": agg_cube,
    "agg_higher_moments": agg_higher_moments,
    "olap_period_over_period": olap_period_over_period,
}

ORACLE = {
    "olap_period_over_period": """
        WITH monthly AS (
            SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders GROUP BY 1
        )
        SELECT month, revenue,
               round(revenue - lag(revenue, 1) OVER w, 2) AS mom_delta,
               round((revenue - lag(revenue, 1) OVER w)
                     / lag(revenue, 1) OVER w * 100, 4) AS mom_pct,
               round((revenue - lag(revenue, 12) OVER w)
                     / lag(revenue, 12) OVER w * 100, 4) AS yoy_pct
        FROM monthly
        WINDOW w AS (ORDER BY month)
        ORDER BY month
    """,
    "agg_higher_moments": _MOMENTS_SQL,
    "agg_cube": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "agg_mode": """
        WITH counts AS (
            SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY user_id, event_type
        ),
        ranked AS (
            SELECT user_id, event_type, n,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY n DESC, event_type
                   ) AS rn
            FROM counts
        )
        SELECT user_id, event_type AS mode_type, n FROM ranked WHERE rn = 1
    """,
    "agg_histogram": f"""
        WITH dom AS (
            SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
        ),
        binned AS (
            SELECT least(CAST(floor((o_totalprice - dom.lo)
                                    / ((dom.hi - dom.lo) / {N_BINS})) AS BIGINT),
                         {N_BINS - 1}) AS bin,
                   round(dom.lo + ((dom.hi - dom.lo) / {N_BINS})
                         * least(CAST(floor((o_totalprice - dom.lo)
                                    / ((dom.hi - dom.lo) / {N_BINS})) AS BIGINT),
                                 {N_BINS - 1}), 2) AS bin_lo
            FROM orders CROSS JOIN dom
        )
        SELECT bin, bin_lo, CAST(count(*) AS BIGINT) AS n
        FROM binned GROUP BY bin, bin_lo
    """,
}
