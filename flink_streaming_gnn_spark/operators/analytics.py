"""Classic OLAP analytics shapes over the fixtures — the query patterns a
product-analytics user of the engine writes daily (SURVEY.md §2B
relational rows, rounding out the aggregate/window families):

* ``agg_corr_covar`` — statistical aggregates (Pearson correlation,
  sample covariance/stddev) per group: single hash agg, all moments
  computed map-side-combinable (sum/sum²/sum-of-products), no second pass.
* ``win_distribution`` — percent_rank / cume_dist distribution window
  functions (the ranking family's missing half).
* ``cohort_retention`` — first-seen-week cohort × weeks-since-cohort
  distinct-user retention triangle: two hash aggs (first-seen, then
  cohort cell), the canonical growth-analytics query.
* ``funnel_conversion`` — ordered signup→view→click→purchase funnel:
  per-user stage timestamps via conditional min (one agg), stage counted
  only when it happens AFTER the previous stage (time-ordered funnel),
  then one tiny roll-up.

All four are pure built-in expressions (one or two shuffles each, every
aggregate algebraic), hash-matched against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.plans.hints import maybe_broadcast
from flink_streaming_gnn_spark.sources.tables import load_table


def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag price/quantity relationship: Pearson corr, sample
    covariance, sample stddevs. One hash aggregate; every statistic is a
    combination of distributive moments, so the shuffle carries one partial
    row per (group, mapper)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
    )


def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank and cume_dist of order totalprice within each
    priority class (bounded to one month of orders to keep the result
    set stable)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-02-01")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: users grouped by first-seen ISO week, counted
    distinct in each subsequent week offset. Two aggs: per-user first-seen
    (shuffle on user), then per (cohort_week, week_offset) distinct users
    (shuffle on the small cell key)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    )
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(
                (F.unix_timestamp("wk") - F.unix_timestamp("cohort_wk")) / (7 * 86400)
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-ordered signup→view→click→purchase funnel: per-user conditional
    min timestamps in ONE aggregate, a stage counts only if it occurs
    strictly after the previous stage's first occurrence; output is the
    per-stage user count (the funnel bar chart)."""
    ev = load_table(spark, sf_dir, "events")
    stages = ["signup", "view", "click", "purchase"]
    per_user = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
            for s in stages
        ]
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & F.col("t_view").isNotNull() & (F.col("t_view") > F.col("t_signup"))
    s3 = s2 & F.col("t_click").isNotNull() & (F.col("t_click") > F.col("t_view"))
    s4 = s3 & F.col("t_purchase").isNotNull() & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.sum(s1.cast("long")).cast("long").alias("n_signup"),
        F.sum(s2.cast("long")).cast("long").alias("n_then_view"),
        F.sum(s3.cast("long")).cast("long").alias("n_then_click"),
        F.sum(s4.cast("long")).cast("long").alias("n_then_purchase"),
    )


def abc_pareto_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of suppliers by revenue: rank suppliers
    by revenue desc, compute the running share of total, and classify
    A (first 80% of revenue), B (next 15%), C (tail). Two aggs + two
    windows; the global total rides the same unpartitioned window as the
    cumsum (single-reducer by definition — the input to that window is the
    per-supplier aggregate, |suppliers| rows, not the fact table)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )
    w_rank = Window.orderBy(F.col("revenue").desc(), F.col("l_suppkey"))
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    cum = rev.select(
        "l_suppkey",
        "revenue",
        F.row_number().over(w_rank).cast("long").alias("rev_rank"),
        F.round(
            F.sum("revenue").over(w_cum) / F.sum("revenue").over(w_all), 6
        ).alias("cum_share"),
    )
    return cum.withColumn(
        "abc_class",
        F.when(F.col("cum_share") <= 0.80, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C"),
    )


MB_MIN_CO = 3  # minimum co-occurrence support (absolute baskets)
MB_TOP = 100


def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets (the retail classic:
    supplier pairs shipped in the same order scored by lift and
    confidence). lift = N·co / (cnt_a·cnt_b): > 1 means the pair
    co-occurs more than independence predicts.

    Shape: distinct (basket, item) projection, item counts in one hash
    agg, the pair join is the same orderkey wedge join as the graph
    projection (bounded by per-order line counts, so linear in orders),
    then two broadcast-gated count joins and a 1-row basket-total
    cross-join. Top-{MB_TOP} by rounded lift with full deterministic
    tiebreak. At 100 TB the pair space is pruned by the support filter
    BEFORE the count joins — the standard a-priori trick."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    cnt = items.groupBy("l_suppkey").agg(F.count("*").alias("cnt"))
    n_baskets = items.select("l_orderkey").distinct().agg(
        F.count("*").alias("n_baskets")
    )
    i2 = items.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("b"))
    co = (
        items.join(i2, (items.l_orderkey == i2.o2) & (items.l_suppkey < i2.b))
        .groupBy(F.col("l_suppkey").alias("a"), "b")
        .agg(F.count("*").alias("co"))
        .filter(F.col("co") >= MB_MIN_CO)
    )
    cnt_a = maybe_broadcast(cnt.select(F.col("l_suppkey").alias("a"), F.col("cnt").alias("cnt_a")))
    cnt_b = maybe_broadcast(cnt.select(F.col("l_suppkey").alias("b"), F.col("cnt").alias("cnt_b")))
    scored = (
        co.join(cnt_a, "a")
        .join(cnt_b, "b")
        .crossJoin(maybe_broadcast(n_baskets))
        .select(
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.col("co").cast("long").alias("co_orders"),
            F.round(
                F.col("n_baskets") * F.col("co") / (F.col("cnt_a") * F.col("cnt_b")), 6
            ).alias("lift"),
            F.round(F.col("co") / F.col("cnt_a"), 6).alias("confidence"),
        )
    )
    return scored.orderBy(F.col("lift").desc(), "a", "b").limit(MB_TOP)


def ts_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-active-day streaks (the
    engagement-streak / uptime-island classic). The island key is the
    row_number trick — ``day − rank(day)`` is constant exactly within a
    consecutive run — so the whole analysis is one distinct, one window
    rank, and two hash aggs, all riding the user_id partitioning; no
    joins, no self-comparisons."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = (
        days.withColumn("rn", F.row_number().over(w))
        .withColumn("grp", F.date_sub(F.col("day"), F.col("rn")))
        .groupBy("user_id", "grp")
        .agg(F.count("*").alias("len"))
    )
    return islands.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count("*").cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("max_streak"),
    )


QUERIES = {
    "ts_active_streaks": ts_active_streaks,
    "agg_corr_covar": agg_corr_covar,
    "abc_pareto_class": abc_pareto_class,
    "win_distribution": win_distribution,
    "cohort_retention": cohort_retention,
    "funnel_conversion": funnel_conversion,
    "market_basket_lift": market_basket_lift,
}

ORACLE = {
    "ts_active_streaks": """
        WITH days AS (
            SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
            FROM events
        ),
        islands AS (
            SELECT user_id,
                   day - CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY day) AS INT) AS grp
            FROM days
        ),
        runs AS (
            SELECT user_id, grp, count(*) AS len
            FROM islands GROUP BY user_id, grp
        )
        SELECT user_id,
               CAST(sum(len) AS BIGINT) AS n_active_days,
               CAST(count(*) AS BIGINT) AS n_streaks,
               CAST(max(len) AS BIGINT) AS max_streak
        FROM runs GROUP BY user_id
    """,
    "market_basket_lift": f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        ),
        cnt AS (
            SELECT l_suppkey, count(*) AS cnt FROM items GROUP BY l_suppkey
        ),
        n AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM items),
        co AS (
            SELECT i1.l_suppkey AS a, i2.l_suppkey AS b, count(*) AS co
            FROM items i1
            JOIN items i2 ON i1.l_orderkey = i2.l_orderkey
                         AND i1.l_suppkey < i2.l_suppkey
            GROUP BY i1.l_suppkey, i2.l_suppkey
            HAVING count(*) >= {MB_MIN_CO}
        )
        SELECT CAST(a AS BIGINT) AS a,
               CAST(b AS BIGINT) AS b,
               CAST(co AS BIGINT) AS co_orders,
               round(n.n_baskets * co * 1.0 / (ca.cnt * cb.cnt), 6) AS lift,
               round(co * 1.0 / ca.cnt, 6) AS confidence
        FROM co
        JOIN cnt ca ON ca.l_suppkey = co.a
        JOIN cnt cb ON cb.l_suppkey = co.b
        CROSS JOIN n
        ORDER BY lift DESC, a, b
        LIMIT {MB_TOP}
    """,
    "abc_pareto_class": """
        WITH rev AS (
            SELECT l_suppkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem GROUP BY l_suppkey
        ),
        cum AS (
            SELECT l_suppkey, revenue,
                   CAST(row_number() OVER w AS BIGINT) AS rev_rank,
                   round(sum(revenue) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW)
                         / sum(revenue) OVER (), 6) AS cum_share
            FROM rev
            WINDOW w AS (ORDER BY revenue DESC, l_suppkey)
        )
        SELECT l_suppkey, revenue, rev_rank, cum_share,
               CASE WHEN cum_share <= 0.80 THEN 'A'
                    WHEN cum_share <= 0.95 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM cum
    """,
    "agg_corr_covar": """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_rows,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
               round(stddev_samp(l_quantity), 6) AS std_qty,
               round(stddev_samp(l_extendedprice), 4) AS std_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "win_distribution": """
        SELECT o_orderkey, o_orderpriority,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM orders
        WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-02-01'
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
    """,
    "cohort_retention": """
        WITH ev AS (
            SELECT user_id, date_trunc('week', ts) AS wk FROM events
        ),
        first AS (
            SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id
        )
        SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
               CAST(floor(date_diff('day', cohort_wk, wk) / 7.0) AS BIGINT)
                   AS week_offset,
               CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_users
        FROM ev JOIN first ON ev.user_id = first.user_id
        GROUP BY cohort_wk, floor(date_diff('day', cohort_wk, wk) / 7.0)
    """,
    "funnel_conversion": """
        WITH per_user AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
                   min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
            FROM events GROUP BY user_id
        )
        SELECT CAST(sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_signup,
               CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_view IS NOT NULL
                              AND t_view > t_signup THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_then_view,
               CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_view IS NOT NULL
                              AND t_view > t_signup AND t_click IS NOT NULL
                              AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_then_click,
               CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_view IS NOT NULL
                              AND t_view > t_signup AND t_click IS NOT NULL
                              AND t_click > t_view AND t_purchase IS NOT NULL
                              AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_then_purchase
        FROM per_user
    """,
}
