"""Distributional shape analytics (SURVEY.md §2B analytics family):
the Gini coefficient and a Zipf-law fit — the two summary statistics a
corpus/revenue analyst reaches for when asking "how concentrated is
this distribution".

* ``agg_gini_coefficient`` — Gini of supplier revenue via the exact
  rank formula over the sorted distribution,

      G = 2·Σ i·x_(i) / (n·Σ x) − (n+1)/n,

  computed with one rank window + one aggregate over the per-supplier
  revenue table (|suppliers| rows — the window is single-reducer by
  definition of a GLOBAL inequality statistic over an aggregate, the
  abc_pareto discipline; the fact-table pass below it is distributed).
* ``text_zipf_fit`` — fit the Zipf exponent: token frequencies ranked
  desc, then OLS of ln(freq) on ln(rank) via ``regr_slope`` /
  ``regr_r2`` — the slope is −s in freq ∝ rank^(−s) and r² says how
  Zipfian the corpus is (natural text ≈ −1 with high r²). One corpus
  token aggregation, one rank window over the |vocab|-sized table, one
  regression aggregate.

Both round to 6 dp; ties in the rank windows carry deterministic
tie-breaks so the ranks (and therefore the sums) are identical across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table


def agg_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    w = Window.orderBy("revenue", "l_suppkey")
    ranked = rev.select(
        "revenue", F.row_number().over(w).cast("double").alias("i")
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_suppliers"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("revenue"))
            / (F.count("*") * F.sum("revenue"))
            - (F.count("*") + 1.0) / F.count("*"),
            6,
        ).alias("gini"),
    )


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").cast("double").alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("token"))
    ranked = freq.select(
        F.log(F.row_number().over(w).cast("double")).alias("lr"),
        F.log("freq").alias("lf"),
    )
    return ranked.agg(
        F.count("*").cast("long").alias("vocab"),
        F.round(F.regr_slope("lf", "lr"), 6).alias("zipf_slope"),
        F.round(F.regr_r2("lf", "lr"), 6).alias("zipf_r2"),
    )


XCORR_MAX_LAG = 6  # hours each direction


def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead–lag discovery between two event streams: Pearson correlation
    of the hourly view-count series against the hourly purchase-count
    series at every lag in ±XCORR_MAX_LAG hours — "do purchases follow
    views, and by how long?", the classic cross-correlation function.

    Shape: ONE distributed hourly aggregation builds both series
    (conditional counts in the same pass), then each lag is one
    ``lag()`` column over the |hours|-sized series and the correlations
    are 2·K+1 ``corr`` aggregates in ONE final pass — never a self-join
    per lag. The series is calendar-bounded (abc_pareto discipline)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.sum((F.col("event_type") == "view").cast("long")).alias("views"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("buys"),
    )
    def name(prefix: str, k: int) -> str:  # minus signs are not column-safe
        return f"{prefix}m{-k}" if k < 0 else f"{prefix}{k}"

    w = Window.orderBy("bucket")
    lagged = hourly.select(
        "views",
        *[
            F.lag("buys", k).over(w).alias(name("b", k))
            for k in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1)
        ],
    )
    rows = lagged.agg(
        *[
            F.round(F.corr("views", name("b", k)), 6).alias(name("c", k))
            for k in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1)
        ]
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("lag_hours"),
                        F.col(name("c", k)).alias("xcorr"),
                    )
                    for k in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1)
                ]
            )
        ).alias("r")
    )
    return rows.select("r.lag_hours", "r.xcorr").orderBy("lag_hours")


def _xcorr_oracle_sql() -> str:
    def nm(prefix: str, k: int) -> str:
        return f"{prefix}m{-k}" if k < 0 else f"{prefix}{k}"

    lag_cols = ",\n               ".join(
        f"lag(buys, {k}) OVER (ORDER BY bucket) AS {nm('b', k)}"
        for k in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1)
    )
    corr_cols = ",\n               ".join(
        f"round(corr(views, {nm('b', k)}), 6) AS {nm('c', k)}"
        for k in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1)
    )
    selects = "\n            UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS lag_hours, {nm('c', k)} AS xcorr FROM cs"
        for k in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1)
    )
    return f"""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS bucket,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                        AS BIGINT) AS views,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        AS BIGINT) AS buys
            FROM events GROUP BY 1
        ),
        lagged AS (
            SELECT views,
               {lag_cols}
            FROM hourly
        ),
        cs AS (
            SELECT {corr_cols}
            FROM lagged
        )
        {selects}
        ORDER BY lag_hours
    """


QUERIES = {
    "agg_gini_coefficient": agg_gini_coefficient,
    "text_zipf_fit": text_zipf_fit,
    "ts_cross_correlation": ts_cross_correlation,
}

ORACLE = {
    "ts_cross_correlation": _xcorr_oracle_sql(),
    "agg_gini_coefficient": """
        WITH rev AS (
            SELECT l_suppkey,
                   sum(l_extendedprice * (1 - l_discount)) AS revenue
            FROM lineitem GROUP BY l_suppkey
        ),
        ranked AS (
            SELECT revenue,
                   CAST(row_number() OVER (ORDER BY revenue, l_suppkey)
                        AS DOUBLE) AS i
            FROM rev
        )
        SELECT CAST(count(*) AS BIGINT) AS n_suppliers,
               round(2.0 * sum(i * revenue) / (count(*) * sum(revenue))
                     - (count(*) + 1.0) / count(*), 6) AS gini
        FROM ranked
    """,
    "text_zipf_fit": """
        WITH freq AS (
            SELECT token, CAST(count(*) AS DOUBLE) AS freq
            FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
            WHERE token <> ''
            GROUP BY token
        ),
        ranked AS (
            SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, token)
                           AS DOUBLE)) AS lr,
                   ln(freq) AS lf
            FROM freq
        )
        SELECT CAST(count(*) AS BIGINT) AS vocab,
               round(regr_slope(lf, lr), 6) AS zipf_slope,
               round(regr_r2(lf, lr), 6) AS zipf_r2
        FROM ranked
    """,
}


def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T and mean-log-deviation (Theil L) of supplier revenue —
    the decomposable entropy-based inequality indices next to
    ``agg_gini_coefficient`` (T = E[(x/μ)·ln(x/μ)], L = −E[ln(x/μ)];
    both 0 at perfect equality, T ≤ ln(n)). Unlike the Gini's rank
    window, the Theil family needs NO global sort — one distributed
    revenue aggregate, one 1-row mean broadcast back, one final mean:
    the fully-parallel inequality measure (and the reason analysts use
    it for by-group decomposition at scale). Revenues are strictly
    positive (price·(1−disc)), so ln is total."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("x")
    )
    mu = rev.agg(F.avg("x").alias("mu"))
    ratio = F.col("x") / F.col("mu")
    return (
        rev.join(F.broadcast(mu))
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            F.round(F.avg(ratio * F.log(ratio)), 6).alias("theil_t"),
            F.round(-F.avg(F.log(ratio)), 6).alias("theil_l"),
        )
    )


QUERIES["agg_theil_index"] = agg_theil_index
ORACLE["agg_theil_index"] = """
    WITH rev AS (
        SELECT l_suppkey,
               sum(l_extendedprice * (1 - l_discount)) AS x
        FROM lineitem GROUP BY l_suppkey
    ),
    m AS (SELECT avg(x) AS mu FROM rev)
    SELECT CAST(count(*) AS BIGINT) AS n_suppliers,
           round(avg((x / mu) * ln(x / mu)), 6) AS theil_t,
           round(-avg(ln(x / mu)), 6) AS theil_l
    FROM rev, m
"""


def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index of supplier revenue —
    the antitrust-grade market-concentration scalar next to the Gini
    and Theil indices: HHI = Σ share_i² (0 → atomized, 1 → monopoly),
    plus the equivalent-competitor count 1/HHI. Like Theil, NO global
    sort: one distributed revenue aggregate, one 1-row total broadcast
    back, one final sum of squared shares."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("x")
    )
    tot = rev.agg(F.sum("x").alias("t"))
    share = F.col("x") / F.col("t")
    return rev.join(F.broadcast(tot)).agg(
        F.count("*").cast("long").alias("n_suppliers"),
        F.round(F.sum(share * share), 6).alias("hhi"),
        F.round(1.0 / F.sum(share * share), 6).alias("effective_n"),
    )


QUERIES["agg_hhi_concentration"] = agg_hhi_concentration
ORACLE["agg_hhi_concentration"] = """
    WITH rev AS (
        SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS x
        FROM lineitem GROUP BY l_suppkey
    ),
    t AS (SELECT sum(x) AS t FROM rev)
    SELECT CAST(count(*) AS BIGINT) AS n_suppliers,
           round(sum((x / t) * (x / t)), 6) AS hhi,
           round(1.0 / sum((x / t) * (x / t)), 6) AS effective_n
    FROM rev, t
"""


def agg_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lorenz curve at decile resolution — the distribution behind
    the Gini/Theil/HHI scalars ("the top decile books X% of revenue"):
    per revenue decile, supplier count, revenue share and cumulative
    share. Deciles come from EXACT percentile cut points broadcast back
    (the ``agg_trimmed_winsorized_mean`` discipline — rounded cuts so
    both engines bucket the identical row set; no global sort, no
    unpartitioned ntile — the ``user_rfm_segments`` scale lesson); the
    cumulative share is a window over the 10-row frame."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("x")
    )
    cuts = rev.agg(
        *[
            F.round(F.percentile("x", F.lit(i / 10)), 4).alias(f"c{i}")
            for i in range(1, 10)
        ]
    )
    decile = F.lit(1)
    for i in range(1, 10):
        decile = decile + F.when(F.col("x") > F.col(f"c{i}"), 1).otherwise(0)
    binned = rev.join(F.broadcast(cuts)).select(
        decile.cast("long").alias("decile"), "x"
    )
    per_d = binned.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_suppliers"),
        F.sum("x").alias("rev_d"),
    )
    wall = Window.partitionBy()
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per_d.select(
        "decile",
        "n_suppliers",
        F.round(F.col("rev_d") / F.sum("rev_d").over(wall), 6).alias("rev_share"),
        F.round(
            F.sum("rev_d").over(wcum) / F.sum("rev_d").over(wall), 6
        ).alias("cum_share"),
    ).orderBy("decile")


QUERIES["agg_lorenz_deciles"] = agg_lorenz_deciles
ORACLE["agg_lorenz_deciles"] = f"""
    WITH rev AS (
        SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS x
        FROM lineitem GROUP BY l_suppkey
    ),
    cuts AS (
        SELECT {", ".join(
            f"round(quantile_cont(x, {i / 10}), 4) AS c{i}" for i in range(1, 10)
        )}
        FROM rev
    ),
    binned AS (
        SELECT CAST(1 {" ".join(
            f"+ CASE WHEN x > c{i} THEN 1 ELSE 0 END" for i in range(1, 10)
        )} AS BIGINT) AS decile, x
        FROM rev, cuts
    ),
    per_d AS (
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               sum(x) AS rev_d
        FROM binned GROUP BY decile
    )
    SELECT decile, n_suppliers,
           round(rev_d / sum(rev_d) OVER (), 6) AS rev_share,
           round(sum(rev_d) OVER (ORDER BY decile
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW)
                 / sum(rev_d) OVER (), 6) AS cum_share
    FROM per_d
    ORDER BY decile
"""
