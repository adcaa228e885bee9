"""Robust / order-statistic analytics (SURVEY.md §2B timeseries +
aggregation families): rolling median, weighted median, and SAX
symbolization — the estimators a pipeline reaches for when means are
skew-poisoned (sensor spikes, price outliers, heavy-tailed values).

All three are pure JVM window/agg plans:

* ``ts_rolling_median`` — exact median over a 7-row trailing frame per
  user. Spark has no native ``median`` window function, so the frame is
  materialized as a bounded ``collect_list`` window (7 doubles per row —
  constant memory per row at any scale), sorted in-expression, and the
  middle element(s) read out. The DuckDB twin is its native windowed
  ``median`` (quantile_cont 0.5, averaging the two middles on even
  frames — matched exactly by the expression here).
* ``agg_weighted_median`` — lower weighted median per group via the
  classic cumulative-weight window: the smallest value whose running
  weight reaches half the group total. Two windows + one aggregate,
  shuffling once on the group key; value-ties are harmless (every tied
  row carries the same value, so the crossing row's value is unique).
* ``ts_hampel_filter`` — the Hampel identifier (Pearson 2002): flag a
  point as an outlier when it sits more than 3 scaled MADs
  (1.4826·MAD ≈ σ under normality) from the rolling median of its
  trailing 7-row frame, and emit the median-imputed series. Median AND
  MAD both come from ONE bounded ``collect_list`` window (the
  ``ts_rolling_median`` frame reused); deviations are computed against
  the 6-dp-rounded median and re-rounded before the threshold compare,
  so the outlier bit cannot straddle an engine ulp.
* ``ts_sax_symbolize`` — SAX (Lin et al., "Symbolic Aggregate
  approXimation") per-user symbolic word: z-normalize each event value
  against the user's mean/std, bucket into 4 letters at the standard
  N(0,1) quartile breakpoints (−0.6745, 0, 0.6745), and concatenate in
  time order. The word is an order-preserving fingerprint of the shape
  of each user's series — the time-series analogue of the document
  fingerprints in ``llm/textstats.py``. z is rounded to 6 dp before
  bucketing so the letter choice can't straddle an engine ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

FRAME = 7  # rolling-median trailing frame (6 preceding + current)
BREAKS = (-0.6745, 0.0, 0.6745)  # N(0,1) quartile breakpoints → 4 letters


def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exact rolling median of ``value`` over the trailing 7-row
    frame ordered by (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(FRAME - 1), 0)
    )
    frame = F.array_sort(F.collect_list("value").over(w))
    n = F.size(frame)
    mid_hi = F.element_at(frame, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(frame, F.greatest((n / 2).cast("int"), F.lit(1)))
    med = F.when(n % 2 == 1, F.element_at(frame, ((n + 1) / 2).cast("int"))).otherwise(
        (mid_lo + mid_hi) / 2
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "value",
            F.round(med, 6).alias("roll_med"),
        )
        .orderBy("event_id")
    )


def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag lower weighted median of extendedprice weighted by
    quantity: min price whose cumulative quantity ≥ half the flag total."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber"
    )
    w_tot = Window.partitionBy("l_returnflag")
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("l_quantity").over(w_cum).alias("cum_w"),
        F.sum("l_quantity").over(w_tot).alias("tot_w"),
    )
    return (
        cum.filter(F.col("cum_w") >= F.col("tot_w") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("w_median"),
            F.round(F.min("tot_w"), 2).alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


HAMPEL_T = 3.0 * 1.4826  # threshold in scaled-MAD units


def _arr_median(arr):
    """Exact median of a sorted array column (quantile_cont 0.5 shape:
    even frames average the two middles — matches DuckDB)."""
    n = F.size(arr)
    mid_hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(arr, F.greatest((n / 2).cast("int"), F.lit(1)))
    return F.when(n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int"))).otherwise(
        (mid_lo + mid_hi) / 2
    )


def ts_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Hampel outlier filter over the trailing 7-row frame:
    median + MAD from one collect_list window, 3-scaled-MAD threshold,
    median-imputed output series."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(FRAME - 1), 0)
    )
    framed = ev.select(
        "event_id", "user_id", "value", F.collect_list("value").over(w).alias("frame")
    )
    med = framed.withColumn(
        "med", F.round(_arr_median(F.array_sort("frame")), 6)
    )
    devs = F.array_sort(
        F.transform("frame", lambda e: F.round(F.abs(e - F.col("med")), 6))
    )
    mad = med.withColumn("mad", F.round(_arr_median(devs), 6))
    is_out = F.round(F.abs(F.col("value") - F.col("med")), 6) > F.round(
        F.lit(HAMPEL_T) * F.col("mad"), 6
    )
    return (
        mad.select(
            "event_id",
            "user_id",
            "value",
            F.col("med").alias("roll_med"),
            F.col("mad").alias("roll_mad"),
            is_out.alias("is_outlier"),
            F.when(is_out, F.col("med")).otherwise(F.col("value")).alias("filtered"),
        )
        .orderBy("event_id")
    )


def ts_sax_symbolize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user SAX word: z-scored values bucketed to letters a–d at the
    N(0,1) quartile breakpoints, concatenated in (ts, event_id) order."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    mean = F.mean("value").over(w)
    std = F.stddev_samp("value").over(w)
    z = F.round(
        F.when(std.isNull() | (std == 0), F.lit(0.0)).otherwise(
            (F.col("value") - mean) / std
        ),
        6,
    )
    letter = (
        F.when(z < BREAKS[0], F.lit("a"))
        .when(z < BREAKS[1], F.lit("b"))
        .when(z < BREAKS[2], F.lit("c"))
        .otherwise(F.lit("d"))
    )
    lettered = ev.select("user_id", "ts", "event_id", letter.alias("letter"))
    return (
        lettered.groupBy("user_id")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(ts, event_id, letter))),"
                    " x -> x.letter)"
                ),
                "",
            ).alias("sax_word"),
            F.count("*").cast("long").alias("n_events"),
        )
        .orderBy("user_id")
    )


def ts_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend slope per event_type: the median of all
    pairwise slopes between DAILY mean values (Theil 1950 / Sen 1968) —
    the estimator that survives up to ~29% outlier contamination where
    OLS (``agg_regression``) breaks at one bad point.

    The classic estimator is O(n²) in series length, which would be a
    scale-killer on raw events. The scale discipline here: aggregate to
    the daily mean FIRST (one hash agg on (event_type, day) — the only
    corpus-sized pass), so the pairwise stage runs on a frame bounded by
    |event_type| · |calendar days| — time-range-bounded, NOT
    corpus-bounded. The self-join input is a few hundred rows at any
    corpus size; Catalyst broadcasts it. Median via exact interpolated
    ``percentile`` (matches DuckDB ``quantile_cont``); slopes rounded to
    6 dp after the median so daily-mean fp-order ulps can't leak.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.avg("value").alias("v"))
    # the daily frame is bounded by |event_type| · |calendar days| — tiny
    # at ANY corpus size, so the self-join side is always broadcastable
    a, b = daily.alias("a"), F.broadcast(daily.alias("b"))
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.v") - F.col("a.v"))
            / F.datediff(F.col("b.day"), F.col("a.day"))
        ).alias("slope"),
    )
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.expr("percentile(slope, 0.5)"), 6).alias(
                "theil_sen_slope"
            ),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "ts_rolling_median": ts_rolling_median,
    "agg_weighted_median": agg_weighted_median,
    "ts_hampel_filter": ts_hampel_filter,
    "ts_sax_symbolize": ts_sax_symbolize,
    "ts_theil_sen_trend": ts_theil_sen_trend,
}

ORACLE = {
    "ts_rolling_median": f"""
        SELECT event_id, user_id, value,
               round(median(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {FRAME - 1} PRECEDING AND CURRENT ROW
               ), 6) AS roll_med
        FROM events
        ORDER BY event_id
    """,
    "agg_weighted_median": """
        WITH cum AS (
            SELECT l_returnflag, l_extendedprice,
                   sum(l_quantity) OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_w,
                   sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tot_w
            FROM lineitem
        )
        SELECT l_returnflag,
               min(l_extendedprice) AS w_median,
               round(min(tot_w), 2) AS total_weight
        FROM cum
        WHERE cum_w >= tot_w / 2
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "ts_hampel_filter": f"""
        WITH f AS (
            SELECT event_id, user_id, value,
                   list(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {FRAME - 1} PRECEDING AND CURRENT ROW
                   ) AS frame
            FROM events
        ),
        m AS (
            SELECT *, round(list_aggregate(frame, 'median'), 6) AS med FROM f
        ),
        d AS (
            SELECT *,
                   round(list_aggregate(
                       list_transform(frame, e -> round(abs(e - med), 6)),
                       'median'), 6) AS mad
            FROM m
        )
        SELECT event_id, user_id, value,
               med AS roll_med,
               mad AS roll_mad,
               round(abs(value - med), 6) > round({HAMPEL_T!r} * mad, 6)
                   AS is_outlier,
               CASE WHEN round(abs(value - med), 6) > round({HAMPEL_T!r} * mad, 6)
                    THEN med ELSE value END AS filtered
        FROM d
        ORDER BY event_id
    """,
    "ts_sax_symbolize": f"""
        WITH z AS (
            SELECT user_id, ts, event_id,
                   round(CASE
                       WHEN stddev_samp(value) OVER (PARTITION BY user_id) IS NULL
                            OR stddev_samp(value) OVER (PARTITION BY user_id) = 0
                           THEN 0.0
                       ELSE (value - avg(value) OVER (PARTITION BY user_id))
                            / stddev_samp(value) OVER (PARTITION BY user_id)
                   END, 6) AS zv
            FROM events
        ),
        lettered AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN zv < {BREAKS[0]} THEN 'a'
                        WHEN zv < {BREAKS[1]} THEN 'b'
                        WHEN zv < {BREAKS[2]} THEN 'c'
                        ELSE 'd' END AS letter
            FROM z
        )
        SELECT user_id,
               string_agg(letter, '' ORDER BY ts, event_id) AS sax_word,
               CAST(count(*) AS BIGINT) AS n_events
        FROM lettered
        GROUP BY user_id
        ORDER BY user_id
    """,
    "ts_theil_sen_trend": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS v
            FROM events GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.event_type,
                   (b.v - a.v) / date_diff('day', a.day, b.day) AS slope
            FROM daily a
            JOIN daily b
              ON a.event_type = b.event_type AND a.day < b.day
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_pairs,
               round(quantile_cont(slope, 0.5), 6) AS theil_sen_slope
        FROM pairs
        GROUP BY 1
        ORDER BY 1
    """,
}


TRIM_P = 0.05  # symmetric trim/winsorize fraction


def agg_trimmed_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trimmed and winsorized means of per-order revenue — the two
    classical robust location estimators next to the median/MAD tier:
    the 5%-trimmed mean DROPS the tails, the winsorized mean CLAMPS them
    to the cut points. Shape: one distributed per-order aggregate, one
    exact-percentile pass for the two cut points (percentile ≡
    quantile_cont, the ``agg_percentile`` discipline), then one
    conditional aggregate with the cuts broadcast back — no global sort.
    The trim CONDITION compares against the rounded cuts (4 dp) so both
    engines trim the identical row set; only means are rounded after."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("y")
    )
    cuts = rev.agg(
        F.round(F.percentile("y", F.lit(TRIM_P)), 4).alias("lo"),
        F.round(F.percentile("y", F.lit(1 - TRIM_P)), 4).alias("hi"),
    )
    return rev.join(F.broadcast(cuts)).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.avg("y"), 4).alias("mean"),
        F.round(
            F.avg(F.when((F.col("y") >= F.col("lo")) & (F.col("y") <= F.col("hi")), F.col("y"))),
            4,
        ).alias("trimmed_mean"),
        F.round(
            F.avg(F.greatest(F.least(F.col("y"), F.col("hi")), F.col("lo"))), 4
        ).alias("winsorized_mean"),
        F.min("lo").alias("cut_lo"),
        F.min("hi").alias("cut_hi"),
    )


QUERIES["agg_trimmed_winsorized_mean"] = agg_trimmed_winsorized_mean
ORACLE["agg_trimmed_winsorized_mean"] = f"""
    WITH rev AS (
        SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)) AS y
        FROM lineitem GROUP BY l_orderkey
    ),
    cuts AS (
        SELECT round(quantile_cont(y, {TRIM_P}), 4) AS lo,
               round(quantile_cont(y, {1 - TRIM_P}), 4) AS hi
        FROM rev
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           round(avg(y), 4) AS mean,
           round(avg(CASE WHEN y >= lo AND y <= hi THEN y END), 4)
               AS trimmed_mean,
           round(avg(greatest(least(y, hi), lo)), 4) AS winsorized_mean,
           min(lo) AS cut_lo,
           min(hi) AS cut_hi
    FROM rev, cuts
"""
