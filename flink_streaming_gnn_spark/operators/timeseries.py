"""Time-series operators over the events stream table (SURVEY.md §2B
relational rows; the hypertable-rollup / changelog-materialization pair a
telemetry pipeline needs next to the windowed aggregates in streaming/).

* ``rollup_hypertable_events`` — multi-granularity time rollup
  (total → per-day → per-day-per-hour) in ONE pass via ROLLUP grouping
  sets: Spark expands the sets inside a single hash aggregate (Expand +
  partial agg), so the coarse tiers are map-side combines of the fine
  tier, not re-scans. This is the batch shape of a continuous-aggregate /
  hypertable rollup: at 100 TB the same query over a date-partitioned
  table prunes to the dirty partitions and upserts the rollup sink.

* ``cdc_latest_snapshot`` — changelog → current-state materialization:
  latest record per user via one window row_number (single shuffle on the
  key, WindowGroupLimit pushes the rank-1 filter below the sort), with
  tombstone semantics (a user whose latest event is an ``error`` drops out
  of the snapshot — the DELETE case of a CDC apply). The streaming twin is
  dropDuplicates-on-key over a watermarked stream; the batch form is the
  backfill path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_streaming_gnn_spark.sources.tables import load_table


def rollup_hypertable_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (day, hour): counts, value sums, distinct users per tier.
    gid disambiguates tiers (0=day+hour, 1=day, 3=grand total)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day"),
        F.hour("ts").cast("long").alias("hour"),
        "user_id",
        "value",
    )
    return (
        ev.rollup("day", "hour")
        .agg(
            (F.grouping("day") * 2 + F.grouping("hour")).cast("long").alias("gid"),
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .select("day", "hour", "gid", "n_events", "sum_value", "n_users")
    )


def cdc_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest state per user from the event changelog; users whose newest
    event is a tombstone (``error``) are deleted from the snapshot."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
        )
    )


def ts_gapfill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily resample with forward fill (LOCF) — the timeseries
    densification every telemetry/feature pipeline needs before models see
    the data: per user, one row per calendar day of the user's own
    [first, last] span, days with no events carried forward from the last
    observed daily average.

    Plan shape (scale posture): one hash agg to daily grain (the only
    pass over raw events), a per-user span agg that reuses the user_id
    partitioning, a zero-shuffle calendar explode (``sequence(d0, d1,
    1 day)`` — output bounded by span length, not event count), a left
    join back on (user, day), and one window for the forward fill. Raw
    events are touched exactly once.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.avg("value"), 6).alias("day_avg"),
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = span.select(
        "user_id", F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    filled = cal.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "day_avg",
        F.last("day_avg", ignorenulls=True).over(w).alias("locf_avg"),
    )


def ts_downsample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling to daily grain per user: open/close = first/last
    value by (ts, event_id), high/low = max/min — the classic telemetry /
    market-data compaction. One shuffle on (user, day): the open/close
    ranks and the min/max aggregate all ride the same partitioning
    (windows first, then the group-by reuses the exchange)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        "ts",
        "event_id",
        "value",
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    w_desc = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    marked = ev.select(
        "user_id",
        "day",
        "value",
        F.row_number().over(w).alias("rn_a"),
        F.row_number().over(w_desc).alias("rn_d"),
    )
    return marked.groupBy(
        "user_id", F.date_format("day", "yyyy-MM-dd").alias("day")
    ).agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count("*").cast("long").alias("n_events"),
    )


def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 / lag-7 autocorrelation of the daily load per event type — the
    stationarity / weekly-seasonality diagnostic run before fitting any
    forecasting model. Shape: one hash agg to the daily grain (the shuffle
    carries per-(type, day) partials, never raw events), then both lag
    columns ride ONE window sort on (type, day), then a second tiny agg
    computes the two Pearson correlations from |types|×|days| rows. The
    output is |event_types| rows at any scale."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum("value").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 7).over(w).alias("x7"),
    )
    return lagged.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(F.corr("x", "x1"), 6).alias("acf_lag1"),
        F.round(F.corr("x", "x7"), 6).alias("acf_lag7"),
    )


def ts_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap distribution (median / p90 seconds between
    consecutive events, plus mean) — the arrival-process profile behind
    session-gap and watermark tuning (the 30-minute session gap and the
    10-minute watermark in streaming/ are exactly quantiles of this
    distribution). One window sort per user for the lag, then one hash agg
    with exact interpolated percentiles; gap rows are |events| − |users|,
    the output |users| rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gaps in EXACT integer microseconds (the fixture is micro-precision);
    # the one float division happens after aggregation, so both engines
    # interpolate percentiles over identical integers
    gaps = (
        ev.select(
            "user_id",
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag("ts", 1).over(w).cast("timestamp"))
            ).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.round(F.avg("gap_us") / 1e6, 4).alias("mean_gap_s"),
            F.round(F.percentile("gap_us", F.lit(0.5)) / 1e6, 4).alias("p50_gap_s"),
            F.round(F.percentile("gap_us", F.lit(0.9)) / 1e6, 4).alias("p90_gap_s"),
        )
        .filter(F.col("n_gaps") >= 3)
    )


def ts_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the gap-filled daily grid — the two-sided
    companion of ``ts_gapfill_resample``'s LOCF: missing days get the
    straight line between the previous and next observed daily average
    (pandas ``interpolate(method='time')`` semantics on a daily grid).

    Same one-pass-over-raw-events shape as gapfill, plus two windows on
    the already-(user)-partitioned grid: last-observed (value, day) looking
    back and first-observed looking forward; the blend is pure per-row
    arithmetic on identical inputs in both engines, so it ships unrounded
    (rounding per-row deterministic floats only invents mismatches).
    Span boundaries are observed days by construction, so interior gaps
    always have both anchors; the coalesce fallbacks are belt-and-braces.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        F.round(F.avg("value"), 6).alias("day_avg")
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = span.select(
        "user_id", F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    g = cal.join(daily, ["user_id", "day"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("day_avg").isNotNull(), F.col("day"))
    g = g.select(
        "user_id",
        "day",
        "day_avg",
        F.last("day_avg", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("pd"),
        F.first("day_avg", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("nd"),
    )
    frac = F.datediff("day", "pd").cast("double") / F.datediff("nd", "pd").cast(
        "double"
    )
    interp = (
        F.when(F.col("day_avg").isNotNull(), F.col("day_avg"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return g.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "day_avg",
        interp.alias("interp_avg"),
    )


QUERIES = {
    "rollup_hypertable_events": rollup_hypertable_events,
    "cdc_latest_snapshot": cdc_latest_snapshot,
    "ts_gapfill_resample": ts_gapfill_resample,
    "ts_linear_interpolate": ts_linear_interpolate,
    "ts_downsample_ohlc": ts_downsample_ohlc,
    "ts_autocorrelation": ts_autocorrelation,
    "ts_interarrival_stats": ts_interarrival_stats,
}

ORACLE = {
    "ts_linear_interpolate": """
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   round(avg(value), 6) AS day_avg
            FROM events GROUP BY user_id, date_trunc('day', ts)
        ),
        span AS (
            SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
        ),
        cal AS (
            SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
            FROM span
        ),
        g AS (
            SELECT c.user_id, c.day, d.day_avg
            FROM cal c LEFT JOIN daily d ON d.user_id = c.user_id AND d.day = c.day
        ),
        anchored AS (
            SELECT user_id, day, day_avg,
                   last_value(day_avg IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS pv,
                   last_value(CASE WHEN day_avg IS NOT NULL THEN day END
                              IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS pd,
                   first_value(day_avg IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS nv,
                   first_value(CASE WHEN day_avg IS NOT NULL THEN day END
                               IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS nd
            FROM g
        )
        SELECT user_id,
               strftime(day, '%Y-%m-%d') AS day,
               day_avg,
               CASE WHEN day_avg IS NOT NULL THEN day_avg
                    WHEN pv IS NULL THEN nv
                    WHEN nv IS NULL THEN pv
                    ELSE pv + (nv - pv)
                         * (CAST(date_diff('day', pd, day) AS DOUBLE)
                            / CAST(date_diff('day', pd, nd) AS DOUBLE))
               END AS interp_avg
        FROM anchored
    """,
    "ts_interarrival_stats": """
        WITH gaps AS (
            SELECT user_id,
                   epoch_us(CAST(ts AS TIMESTAMP))
                   - epoch_us(CAST(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP))
                       AS gap_us
            FROM events
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_gaps,
               round(avg(gap_us) / 1e6, 4) AS mean_gap_s,
               round(quantile_cont(gap_us, 0.5) / 1e6, 4) AS p50_gap_s,
               round(quantile_cont(gap_us, 0.9) / 1e6, 4) AS p90_gap_s
        FROM gaps WHERE gap_us IS NOT NULL
        GROUP BY user_id
        HAVING count(*) >= 3
    """,
    "ts_autocorrelation": """
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day, sum(value) AS x
            FROM events GROUP BY event_type, date_trunc('day', ts)
        ),
        lagged AS (
            SELECT event_type, x,
                   lag(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS x1,
                   lag(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS x7
            FROM daily
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               round(corr(x, x1), 6) AS acf_lag1,
               round(corr(x, x7), 6) AS acf_lag7
        FROM lagged GROUP BY event_type
    """,
    "rollup_hypertable_events": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(extract(hour FROM ts) AS BIGINT) AS hour,
               CAST(GROUPING(strftime(ts, '%Y-%m-%d')) * 2
                    + GROUPING(extract(hour FROM ts)) AS BIGINT) AS gid,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS sum_value,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY ROLLUP (strftime(ts, '%Y-%m-%d'), extract(hour FROM ts))
    """,
    "cdc_latest_snapshot": """
        WITH ranked AS (
            SELECT user_id, ts, event_type, value,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        SELECT user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_seen,
               event_type AS last_type,
               value AS last_value
        FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
    "ts_gapfill_resample": """
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   count(*) AS n, round(avg(value), 6) AS day_avg
            FROM events GROUP BY user_id, date_trunc('day', ts)
        ),
        span AS (
            SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
        ),
        cal AS (
            SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
            FROM span
        ),
        filled AS (
            SELECT c.user_id, c.day,
                   coalesce(d.n, 0) AS n_events, d.day_avg
            FROM cal c LEFT JOIN daily d ON d.user_id = c.user_id AND d.day = c.day
        )
        SELECT user_id,
               strftime(day, '%Y-%m-%d') AS day,
               CAST(n_events AS BIGINT) AS n_events,
               day_avg,
               last_value(day_avg IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS locf_avg
        FROM filled
    """,
    "ts_downsample_ohlc": """
        WITH marked AS (
            SELECT user_id, date_trunc('day', ts) AS day, value,
                   row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                      ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM events
        )
        SELECT user_id,
               strftime(day, '%Y-%m-%d') AS day,
               max(CASE WHEN rn_a = 1 THEN value END) AS open,
               round(max(value), 4) AS high,
               round(min(value), 4) AS low,
               max(CASE WHEN rn_d = 1 THEN value END) AS close,
               CAST(count(*) AS BIGINT) AS n_events
        FROM marked
        GROUP BY user_id, day
    """,
}
