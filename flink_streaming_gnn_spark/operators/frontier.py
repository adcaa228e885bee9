"""Pareto frontier + distribution-conformance analytics (SURVEY.md §2B
OLAP / data-quality families): the skyline operator, Benford's-law
first-digit conformance, and Jensen–Shannon categorical drift — three
summary operators an analytics engine is expected to ship next to
``abc_pareto_class`` / ``dq_ks_drift``.

* ``olap_skyline_pareto`` — the SKYLINE operator (Börzsönyi et al.,
  ICDE 2001): parts not dominated on (retail price ↓ better, total
  quantity sold ↑ better). Distributed divide-and-conquer: distinct
  (price, qty) points are hash-bucketed, each bucket computes its LOCAL
  skyline with one partitioned cumulative-max sweep (a point dominated
  inside any subset is dominated globally, so local pruning is sound),
  and the global sweep runs only over the union of local survivors —
  the candidate set is O(buckets · skyline), not O(|parts|). The DuckDB
  oracle is the textbook NOT EXISTS dominator formulation — a
  cross-formulation check of the sweep.
* ``dq_benford_firstdigit`` — first-significant-digit distribution of
  ``l_extendedprice`` vs Benford's log10(1 + 1/d) expectation with the
  chi-square statistic: the classic forensic-accounting / data-quality
  screen for fabricated or truncated numeric columns. One distributed
  aggregate to 9 rows; the first digit comes from integer-to-string
  truncation (format-stable in both engines), never floor(log10(x))
  whose libm boundary behavior is not portable.
* ``dq_js_divergence`` — Jensen–Shannon divergence (base 2) between the
  ``event_type`` distribution of the first and second half of January —
  the categorical complement of ``dq_ks_drift``'s numeric KS test. Two
  conditional counts in ONE pass, |event_type|-bounded arithmetic after.

Exactness discipline: every count is integer; divisions are single
IEEE ops on integer-valued doubles; the only order-sensitive float sums
run over ≤ |event_type| (5) or ≤ 9 terms and are rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

SKY_BUCKETS = 32


def olap_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    sold = (
        li.groupBy("l_partkey")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .join(part, part.p_partkey == F.col("l_partkey"))
        .select(F.col("p_retailprice").alias("price"), "total_qty", "p_partkey")
    )
    # distinct points carry the per-point part census; the sweep below
    # never needs per-part rows again.
    pts = sold.groupBy("price", "total_qty").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.min("p_partkey").alias("first_part"),
    )

    def sweep(df: DataFrame, w: Window) -> DataFrame:
        # order (price asc, qty desc): a point is dominated iff some
        # strictly-earlier row's qty ≥ its qty (earlier ⇒ price strictly
        # smaller, or equal price with strictly larger qty — both strict
        # dominations on distinct points).
        cummax = F.max("total_qty").over(
            w.orderBy(F.col("price").asc(), F.col("total_qty").desc()).rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        return (
            df.withColumn("_cm", cummax)
            .filter(F.col("_cm").isNull() | (F.col("_cm") < F.col("total_qty")))
            .drop("_cm")
        )

    local = sweep(
        pts.withColumn(
            "_bkt", F.pmod(F.xxhash64("price", "total_qty"), F.lit(SKY_BUCKETS))
        ),
        Window.partitionBy("_bkt"),
    ).drop("_bkt")
    return sweep(local, Window.partitionBy()).orderBy("price")


def dq_benford_firstdigit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    digit = F.substring(
        F.floor("l_extendedprice").cast("long").cast("string"), 1, 1
    ).cast("int")
    obs = li.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").cast("long").alias("n_obs")
    )
    wall = Window.partitionBy()
    exp_p = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    contrib = F.round((F.col("n_obs") - F.col("_exp")) ** 2 / F.col("_exp"), 6)
    return (
        obs.select("digit", "n_obs", (F.sum("n_obs").over(wall) * exp_p).alias("_exp"))
        .select(
            "digit",
            "n_obs",
            F.round("_exp", 4).alias("expected_n"),
            contrib.alias("chi2_contrib"),
            F.round(F.sum(contrib).over(wall), 6).alias("chi2_total"),
        )
        .orderBy("digit")
    )


JSD_SPLIT = "2024-01-16 00:00:00"  # events span Jan 2024 at every sf


def dq_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.sum((F.col("ts") < F.lit(JSD_SPLIT).cast("timestamp")).cast("long")).alias(
            "c_a"
        ),
        F.sum((F.col("ts") >= F.lit(JSD_SPLIT).cast("timestamp")).cast("long")).alias(
            "c_b"
        ),
    )
    wall = Window.partitionBy()
    probs = per_type.select(
        "event_type",
        "c_a",
        "c_b",
        (F.col("c_a") / F.sum("c_a").over(wall)).alias("p"),
        (F.col("c_b") / F.sum("c_b").over(wall)).alias("q"),
    ).withColumn("m", (F.col("p") + F.col("q")) / 2.0)
    def kl_term(x: str):
        return F.when(
            F.col(x) > 0, F.col(x) * F.log(F.col(x) / F.col("m")) / F.log(F.lit(2.0))
        ).otherwise(0.0)

    return probs.agg(
        F.sum("c_a").cast("long").alias("n_first_half"),
        F.sum("c_b").cast("long").alias("n_second_half"),
        F.round(
            0.5 * F.sum(kl_term("p")) + 0.5 * F.sum(kl_term("q")), 6
        ).alias("jsd_bits"),
    )


QUERIES = {
    "olap_skyline_pareto": olap_skyline_pareto,
    "dq_benford_firstdigit": dq_benford_firstdigit,
    "dq_js_divergence": dq_js_divergence,
}

ORACLE = {
    "olap_skyline_pareto": """
        WITH sold AS (
            SELECT p.p_retailprice AS price,
                   CAST(sum(l.l_quantity) AS BIGINT) AS total_qty,
                   p.p_partkey
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY p.p_retailprice, p.p_partkey
        ),
        pts AS (
            SELECT price, total_qty,
                   CAST(count(*) AS BIGINT) AS n_parts,
                   min(p_partkey) AS first_part
            FROM sold GROUP BY price, total_qty
        )
        SELECT price, total_qty, n_parts, first_part
        FROM pts a
        WHERE NOT EXISTS (
            SELECT 1 FROM pts b
            WHERE b.price <= a.price AND b.total_qty >= a.total_qty
              AND (b.price < a.price OR b.total_qty > a.total_qty)
        )
        ORDER BY price
    """,
    "dq_benford_firstdigit": """
        WITH obs AS (
            SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS INTEGER) AS digit,
                   CAST(count(*) AS BIGINT) AS n_obs
            FROM lineitem GROUP BY 1
        ),
        scored AS (
            SELECT digit, n_obs,
                   sum(n_obs) OVER () * (ln(1.0 + 1.0 / digit) / ln(10.0))
                       AS e
            FROM obs
        )
        SELECT digit, n_obs,
               round(e, 4) AS expected_n,
               round((n_obs - e) * (n_obs - e) / e, 6) AS chi2_contrib,
               round(sum(round((n_obs - e) * (n_obs - e) / e, 6)) OVER (), 6)
                   AS chi2_total
        FROM scored
        ORDER BY digit
    """,
    "dq_js_divergence": f"""
        WITH per_type AS (
            SELECT event_type,
                   CAST(sum(CASE WHEN ts <  TIMESTAMP '{JSD_SPLIT}'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
                   CAST(sum(CASE WHEN ts >= TIMESTAMP '{JSD_SPLIT}'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
            FROM events GROUP BY event_type
        ),
        probs AS (
            SELECT c_a, c_b,
                   c_a / CAST(sum(c_a) OVER () AS DOUBLE) AS p,
                   c_b / CAST(sum(c_b) OVER () AS DOUBLE) AS q
            FROM per_type
        )
        SELECT CAST(sum(c_a) AS BIGINT) AS n_first_half,
               CAST(sum(c_b) AS BIGINT) AS n_second_half,
               round(0.5 * sum(CASE WHEN p > 0
                                    THEN p * ln(p / ((p + q) / 2)) / ln(2)
                                    ELSE 0 END)
                   + 0.5 * sum(CASE WHEN q > 0
                                    THEN q * ln(q / ((p + q) / 2)) / ln(2)
                                    ELSE 0 END), 6) AS jsd_bits
        FROM probs
    """,
}
