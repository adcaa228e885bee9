"""Mann–Whitney U rank-sum test (SURVEY.md §2B data-quality family,
the nonparametric location test next to ``dq_ks_drift``'s distribution
test): do ``click`` and ``view`` events draw their values from the same
location? U from MIDRANKS with the tie-corrected normal approximation
(Mann & Whitney 1947; midrank/tie treatment per standard practice).

Exactness: on the distinct-value grid, midrank(v) = C(v) + (t(v)+1)/2
where C is the exclusive cumulative pair count and t the tie size —
integers plus exact binary halves, so the rank sum and U are EXACT
doubles; only the z-score (one sqrt) rounds at display.

SCALE-SAFE CUMSUM: the exclusive cumulative count uses the
``dq_ks_drift`` discipline — approx-quantile literal boundaries,
bucket-local windows (parallel), per-bucket totals to the driver
(≤ n_part rows) re-broadcast as offset maps. The DuckDB oracle keeps
the plain single-window formulation (cross-formulation check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

TYPE_A, TYPE_B = "click", "view"


def dq_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    # value IS NOT NULL in BOTH formulations (ADVICE r5): Spark sorts NULLs
    # first, DuckDB last, and a NULL group would silently land in bucket 0
    # (value > bound is NULL -> otherwise(0)) — midranks would diverge if
    # events.value ever carried NULLs. Matches approxQuantile's own
    # null-dropping behavior.
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin([TYPE_A, TYPE_B])
        & F.col("value").isNotNull()
    )
    per_v = (
        ev.groupBy("value")
        .agg(
            F.sum((F.col("event_type") == TYPE_A).cast("long")).alias("c_a"),
            F.sum((F.col("event_type") == TYPE_B).cast("long")).alias("c_b"),
        )
        .withColumn("t", F.col("c_a") + F.col("c_b"))
        .localCheckpoint()  # pins one materialization for the jobs below
    )
    n_part = max(2, int(spark.conf.get("spark.sql.shuffle.partitions")))
    probs = [i / n_part for i in range(1, n_part)]
    bounds = sorted(set(per_v.stat.approxQuantile("value", probs, 0.01)))
    pid = F.lit(0)
    for b in bounds:
        pid = pid + F.when(F.col("value") > F.lit(b), 1).otherwise(0)
    w = (
        Window.partitionBy("_pid")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = per_v.withColumn("_pid", pid).withColumn(
        "lt", F.coalesce(F.sum("t").over(w), F.lit(0))
    )
    totals = {
        r["_pid"]: r["tt"]
        for r in local.groupBy("_pid").agg(F.sum("t").alias("tt")).collect()
    }  # ≤ n_part rows — geometry-bounded driver read
    off, acc = {}, 0
    for p in sorted(totals):
        off[p] = acc
        acc += totals[p]
    off_map = F.create_map(*[F.lit(x) for p in sorted(off) for x in (p, off[p])])
    midrank = (off_map[F.col("_pid")] + F.col("lt")).cast("double") + (
        F.col("t") + 1.0
    ) / 2.0
    agg = local.agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_b").cast("long").alias("n_b"),
        F.sum(F.col("c_a") * midrank).alias("r_a"),
        F.sum(F.col("t") * (F.col("t") * F.col("t") - 1)).alias("tie_term"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = na + nb
    u_a = F.col("r_a") - na * (na + 1.0) / 2.0
    mu = na * nb / 2.0
    sigma = F.sqrt(
        na * nb / 12.0 * ((n + 1.0) - F.col("tie_term") / (n * (n - 1.0)))
    )
    return agg.select(
        "n_a",
        "n_b",
        u_a.alias("u_stat"),
        F.round((u_a - mu) / sigma, 6).alias("z_score"),
    )


QUERIES = {"dq_mann_whitney": dq_mann_whitney}

ORACLE = {
    # plain single-window formulation — cross-checks the bucketed cumsum
    "dq_mann_whitney": f"""
        WITH ev AS (
            SELECT value, event_type FROM events
            WHERE event_type IN ('{TYPE_A}', '{TYPE_B}')
              AND value IS NOT NULL
        ),
        per_v AS (
            SELECT value,
                   CAST(sum(CASE WHEN event_type = '{TYPE_A}' THEN 1 ELSE 0 END)
                       AS BIGINT) AS c_a,
                   CAST(sum(CASE WHEN event_type = '{TYPE_B}' THEN 1 ELSE 0 END)
                       AS BIGINT) AS c_b
            FROM ev GROUP BY value
        ),
        ranked AS (
            SELECT c_a, c_b, c_a + c_b AS t,
                   coalesce(sum(c_a + c_b) OVER (
                       ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM per_v
        ),
        agg AS (
            SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
                   CAST(sum(c_b) AS BIGINT) AS n_b,
                   sum(c_a * (CAST(cum_before AS DOUBLE) + (t + 1.0) / 2.0))
                       AS r_a,
                   sum(t * (t * t - 1)) AS tie_term
            FROM ranked
        )
        SELECT n_a, n_b,
               r_a - n_a * (n_a + 1.0) / 2.0 AS u_stat,
               round((r_a - n_a * (n_a + 1.0) / 2.0
                      - CAST(n_a AS DOUBLE) * n_b / 2.0)
                     / sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
                            * ((n_a + n_b + 1.0)
                               - tie_term / (CAST(n_a + n_b AS DOUBLE)
                                             * (n_a + n_b - 1.0)))), 6)
                   AS z_score
        FROM agg
    """,
}


def dq_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence on the event_type ×
    weekday contingency table — "does event mix depend on the day of
    week?", the categorical-association screen next to the location
    (Mann–Whitney) and distribution (KS) tests. ONE distributed
    conditional-count pass to the |types|×7 table; expected counts
    E = row·col/n and the statistic are window arithmetic on that
    bounded frame. Counts are exact integers; chi2 sums ≤ 35 rounded
    terms (the Benford discipline). Output: one row with the statistic,
    degrees of freedom, and Cramér's V effect size."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("long").alias("weekday")
    ).agg(F.count("*").cast("long").alias("o"))
    wall = Window.partitionBy()
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("weekday")
    exp = (
        F.sum("o").over(wr).cast("double")
        * F.sum("o").over(wc)
        / F.sum("o").over(wall)
    )
    contrib = F.round((F.col("o") - exp) ** 2 / exp, 6)
    scored = obs.select(
        "event_type",
        "weekday",
        "o",
        contrib.alias("chi2_contrib"),
    )
    r = F.count_distinct(F.col("event_type"))
    c = F.count_distinct(F.col("weekday"))
    dof = (r - 1) * (c - 1)
    chi2 = F.round(F.sum("chi2_contrib"), 6)
    n = F.sum("o")
    v = F.round(
        F.sqrt(F.sum("chi2_contrib") / n / F.least(r - 1, c - 1)), 6
    )
    return scored.agg(
        n.cast("long").alias("n_events"),
        chi2.alias("chi2"),
        dof.cast("long").alias("dof"),
        v.alias("cramers_v"),
    )


QUERIES["dq_chi2_independence"] = dq_chi2_independence
ORACLE["dq_chi2_independence"] = """
    WITH obs AS (
        SELECT event_type,
               CAST(dayofweek(ts) AS BIGINT) AS weekday,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT o,
               round((o - sum(o) OVER (PARTITION BY event_type)
                          * CAST(sum(o) OVER (PARTITION BY weekday) AS DOUBLE)
                          / sum(o) OVER ())
                     * (o - sum(o) OVER (PARTITION BY event_type)
                            * CAST(sum(o) OVER (PARTITION BY weekday) AS DOUBLE)
                            / sum(o) OVER ())
                     / (sum(o) OVER (PARTITION BY event_type)
                        * CAST(sum(o) OVER (PARTITION BY weekday) AS DOUBLE)
                        / sum(o) OVER ()), 6) AS chi2_contrib,
               event_type, weekday
        FROM obs
    )
    SELECT CAST(sum(o) AS BIGINT) AS n_events,
           round(sum(chi2_contrib), 6) AS chi2,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT weekday) - 1) AS BIGINT) AS dof,
           round(sqrt(sum(chi2_contrib) / sum(o)
                      / least(count(DISTINCT event_type) - 1,
                              count(DISTINCT weekday) - 1)), 6) AS cramers_v
    FROM scored
"""


def ts_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness on the daily demand
    direction — "do up/down days cluster more than chance?", the
    serial-dependence screen a forecaster runs before trusting ACF/PACF
    estimates. Signs come from the exact-integer daily deltas (zero
    deltas dropped, standard practice); the run count is 1 + Σ(sign
    changes) via one lag over the calendar-bounded series; the normal
    approximation z = (R − μ)/σ with μ = 2·n₊·n₋/n + 1 and
    σ² = (μ−1)(μ−2)/(n−1) is closed-form integer arithmetic until the
    final sqrt."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.date_trunc("day", "l_shipdate").alias("day")).agg(
        F.sum("l_quantity").cast("long").alias("qty")
    )
    wl = Window.orderBy("day")
    signs = (
        daily.select(
            "day", (F.col("qty") - F.lag("qty").over(wl)).alias("delta")
        )
        .filter(F.col("delta").isNotNull() & (F.col("delta") != 0))
        .select("day", F.signum("delta").cast("int").alias("s"))
    )
    runs = signs.select(
        "s",
        (F.col("s") != F.lag("s").over(Window.orderBy("day")))
        .cast("long")
        .alias("chg"),
    ).agg(
        F.sum((F.col("s") > 0).cast("long")).cast("long").alias("n_up"),
        F.sum((F.col("s") < 0).cast("long")).cast("long").alias("n_down"),
        (F.coalesce(F.sum("chg"), F.lit(0)) + 1).cast("long").alias("n_runs"),
    )
    np_, nm = F.col("n_up").cast("double"), F.col("n_down").cast("double")
    n = np_ + nm
    mu = 2.0 * np_ * nm / n + 1.0
    sigma = F.sqrt((mu - 1.0) * (mu - 2.0) / (n - 1.0))
    return runs.select(
        "n_up",
        "n_down",
        "n_runs",
        F.round((F.col("n_runs") - mu) / sigma, 6).alias("z_score"),
    )


QUERIES["ts_runs_test"] = ts_runs_test
ORACLE["ts_runs_test"] = """
    WITH daily AS (
        SELECT date_trunc('day', l_shipdate) AS day,
               CAST(sum(l_quantity) AS BIGINT) AS qty
        FROM lineitem GROUP BY 1
    ),
    signs AS (
        SELECT day, sign(delta) AS s FROM (
            SELECT day, qty - lag(qty) OVER (ORDER BY day) AS delta
            FROM daily
        ) WHERE delta IS NOT NULL AND delta <> 0
    ),
    runs AS (
        SELECT CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
               CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
               CAST(coalesce(sum(CASE WHEN s <> prev THEN 1 ELSE 0 END), 0)
                    + 1 AS BIGINT) AS n_runs
        FROM (
            SELECT s, lag(s) OVER (ORDER BY day) AS prev FROM signs
        )
    )
    SELECT n_up, n_down, n_runs,
           round((n_runs - (2.0 * n_up * n_down / (n_up + n_down) + 1.0))
                 / sqrt((2.0 * n_up * n_down / (n_up + n_down))
                        * (2.0 * n_up * n_down / (n_up + n_down) - 1.0)
                        / (n_up + n_down - 1.0)), 6) AS z_score
    FROM runs
"""


B_RESAMPLES = 32
# quantized-Poisson(1) weight table on one md5 nibble (16 outcomes):
# P(0)=6/16, P(1)=6/16, P(2)=3/16, P(4)=1/16 — mean exactly 1, the
# deterministic stand-in for the Poisson bootstrap's w ~ Poisson(1)
_W_TABLE = [0] * 6 + [1] * 6 + [2] * 3 + [4]


def agg_bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for mean order revenue via the
    POISSON BOOTSTRAP (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google 2012) — the one-pass distributed
    bootstrap: instead of materializing B resamples, every row draws an
    independent ~Poisson(1) weight per replicate and all B weighted
    means are computed in a SINGLE aggregation pass. This is THE way to
    put error bars on a statistic at 100 TB (resampling passes are
    unaffordable; weights ride the existing scan).

    Deterministic, engine-portable draws: replicate b's weight for an
    order is a quantized-Poisson table lookup on one md5 nibble of
    ``orderkey_b`` (mean exactly 1 — the md5-nibble discipline). The CI
    is the 2.5%/97.5% exact interpolated quantile of the B = 32
    replicate means — a bounded 32-value tail computation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("y")
    )
    table = F.array(*[F.lit(w) for w in _W_TABLE])

    def weight(b: int):
        nib = F.conv(
            F.substring(
                F.md5(F.concat_ws("_", F.col("l_orderkey"), F.lit(str(b)))), 1, 1
            ),
            16,
            10,
        ).cast("int")
        return F.element_at(table, nib + 1)

    agg = per_order.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.avg("y"), 4).alias("mean_rev"),
        *[F.sum(weight(b) * F.col("y")).alias(f"s{b}") for b in range(B_RESAMPLES)],
        *[F.sum(weight(b)).cast("long").alias(f"w{b}") for b in range(B_RESAMPLES)],
    )
    means = F.array(
        *[(F.col(f"s{b}") / F.col(f"w{b}")) for b in range(B_RESAMPLES)]
    )
    return (
        agg.select("n_orders", "mean_rev", F.explode(means).alias("m"))
        .groupBy("n_orders", "mean_rev")
        .agg(
            F.round(F.expr("percentile(m, 0.025)"), 4).alias("ci_lo"),
            F.round(F.expr("percentile(m, 0.975)"), 4).alias("ci_hi"),
        )
    )


QUERIES["agg_bootstrap_ci_poisson"] = agg_bootstrap_ci_poisson


def _bootstrap_oracle() -> str:
    # weight expression for replicate b in DuckDB: nibble → table lookup
    tbl = "[" + ", ".join(str(w) for w in _W_TABLE) + "]"

    def w(b: int) -> str:
        return (
            f"{tbl}[strpos('0123456789abcdef',"
            f" substr(md5(CAST(l_orderkey AS VARCHAR) || '_{b}'), 1, 1))]"
        )

    s_cols = ",\n               ".join(
        f"sum({w(b)} * y) AS s{b}" for b in range(B_RESAMPLES)
    )
    w_cols = ",\n               ".join(
        f"CAST(sum({w(b)}) AS BIGINT) AS w{b}" for b in range(B_RESAMPLES)
    )
    means = ", ".join(f"s{b} / w{b}" for b in range(B_RESAMPLES))
    return f"""
        WITH per_order AS (
            SELECT l_orderkey,
                   sum(l_extendedprice * (1 - l_discount)) AS y
            FROM lineitem GROUP BY l_orderkey
        ),
        agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_orders,
                   round(avg(y), 4) AS mean_rev,
                   {s_cols},
                   {w_cols}
            FROM per_order
        ),
        m AS (
            SELECT n_orders, mean_rev, unnest([{means}]) AS m FROM agg
        )
        SELECT n_orders, mean_rev,
               round(quantile_cont(m, 0.025), 4) AS ci_lo,
               round(quantile_cont(m, 0.975), 4) AS ci_hi
        FROM m GROUP BY n_orders, mean_rev
    """


ORACLE["agg_bootstrap_ci_poisson"] = _bootstrap_oracle()
