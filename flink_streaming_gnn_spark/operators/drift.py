"""Distribution-drift detection (SURVEY.md §2B data-quality family,
next to ``dq_constraint_check`` / ``profile_*``): the two-sample
Kolmogorov–Smirnov statistic between event populations — the standard
training-data QA check that a feature's distribution has not shifted
between two slices (here: ``click`` vs ``view`` events' ``value``).

Exact semantics: D = max over observed values v of
|F_a(v) − F_b(v)| where F is the empirical CDF. On the distinct-value
grid this is a cumulative count per side divided by the side totals —
all integer arithmetic until the final division, so the statistic is a
deterministic rational and both engines agree bit-for-bit after
rounding.

SCALE-SAFE CUMSUM (no single-reducer window): the distinct-value grid
grows with the corpus, so the cumulative counts use the same
literal-boundary bucketing as ``operators/behavior._exact_ntile_desc``
— approx-quantile boundaries captured as literals (consistent across
jobs by construction), bucket-local cumulative windows (parallel), and
per-bucket totals to the driver (≤ n_part rows) re-broadcast as offset
maps. The DuckDB oracle keeps the plain single-window formulation — a
cross-formulation check of the distributed cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

TYPE_A, TYPE_B = "click", "view"


def dq_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: (n_a, n_b, ks_stat) for value-distribution drift between
    TYPE_A and TYPE_B events."""
    # value IS NOT NULL in BOTH formulations (the dq_mann_whitney ADVICE r5
    # fix, applied to the whole distributed-cumsum family): Spark sorts
    # NULLs first, DuckDB last, and a NULL group would land in bucket 0
    # (value > bound is NULL -> otherwise(0)) — the ECDF steps would
    # diverge if events.value ever carried NULLs
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
        .localCheckpoint()  # pins one materialization for the two jobs below
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
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = (
        per_v.withColumn("_pid", pid)
        .withColumn("la", F.sum("c_a").over(w))
        .withColumn("lb", F.sum("c_b").over(w))
    )
    totals = {
        r["_pid"]: (r["ta"], r["tb"])
        for r in local.groupBy("_pid")
        .agg(F.sum("c_a").alias("ta"), F.sum("c_b").alias("tb"))
        .collect()
    }  # ≤ n_part rows — geometry-bounded driver read
    off_a, off_b, acc_a, acc_b = {}, {}, 0, 0
    for p in sorted(totals):
        off_a[p], off_b[p] = acc_a, acc_b
        acc_a += totals[p][0]
        acc_b += totals[p][1]
    n_a, n_b = acc_a, acc_b
    map_a = F.create_map(*[F.lit(x) for p in sorted(off_a) for x in (p, off_a[p])])
    map_b = F.create_map(*[F.lit(x) for p in sorted(off_b) for x in (p, off_b[p])])
    cum_a = (map_a[F.col("_pid")] + F.col("la")).cast("double")
    cum_b = (map_b[F.col("_pid")] + F.col("lb")).cast("double")
    d = F.abs(cum_a / F.lit(float(n_a)) - cum_b / F.lit(float(n_b)))
    return local.agg(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        F.round(F.max(d), 6).alias("ks_stat"),
    )


QUERIES = {"dq_ks_drift": dq_ks_drift}

ORACLE = {
    # plain single-window formulation — cross-checks the bucketed cumsum
    "dq_ks_drift": f"""
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
        cum AS (
            SELECT sum(c_a) OVER (ORDER BY value) AS cum_a,
                   sum(c_b) OVER (ORDER BY value) AS cum_b
            FROM per_v
        )
        SELECT (SELECT CAST(sum(c_a) AS BIGINT) FROM per_v) AS n_a,
               (SELECT CAST(sum(c_b) AS BIGINT) FROM per_v) AS n_b,
               round(max(abs(
                   cum_a / (SELECT CAST(sum(c_a) AS DOUBLE) FROM per_v)
                   - cum_b / (SELECT CAST(sum(c_b) AS DOUBLE) FROM per_v)
               )), 6) AS ks_stat
        FROM cum
    """,
}
