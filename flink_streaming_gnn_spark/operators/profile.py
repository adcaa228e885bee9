"""Data profiling + quality gates (SURVEY.md §2A A15 ops-hardening: the
checks a production ingestion layer runs before anything downstream sees
the data — the relational form of the reference's sink-side accounting).

* ``profile_table_stats`` — one-pass per-column profile of lineitem
  (null rate, distinct estimate vs exact, min/max/mean) emitted as a tall
  (column, metric, value) table. ONE hash-aggregate pass computes every
  measure (Catalyst fuses the 20+ aggregates into one partial+final
  pair); the melt to tall form happens post-aggregation on a 1-row frame.
* ``dq_constraint_check`` — declarative constraint evaluation: each rule
  is a conditional-count aggregate (violations, not rows), so the whole
  rule set is again ONE pass; output is (rule, n_violations, pass).

At 100 TB: both are single-scan single-agg plans — profiling cost equals
one read of the table regardless of how many measures/rules are attached.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.plans.hints import maybe_broadcast
from flink_streaming_gnn_spark.sources.tables import load_table

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount")


def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count("*").cast("double").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("double").alias(f"{c}__nulls"),
            F.countDistinct(c).cast("double").alias(f"{c}__distinct"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
            F.round(F.avg(c), 4).cast("double").alias(f"{c}__mean"),
        ]
    wide = li.agg(*aggs)
    metrics = ["nulls", "distinct", "min", "max", "mean"]
    values = [f"{c}__{m}" for c in _PROFILE_COLS for m in metrics]
    return (
        wide.unpivot(
            ids=["n_rows"], values=values,
            variableColumnName="colmetric", valueColumnName="value",
        )
        .select(
            F.substring_index("colmetric", "__", 1).alias("column"),
            F.substring_index("colmetric", "__", -1).alias("metric"),
            "value",
            F.col("n_rows").cast("long").alias("n_rows"),
        )
    )


_RULES = (
    ("quantity_positive", "l_quantity <= 0"),
    ("discount_in_range", "l_discount < 0 OR l_discount > 0.1"),
    ("price_positive", "l_extendedprice <= 0"),
    ("flag_domain", "l_returnflag NOT IN ('A', 'N', 'R')"),
    ("ship_before_1999", "l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'"),
)


def dq_constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.agg(
        *[
            F.sum(F.when(F.expr(cond), 1).otherwise(0))
            .cast("long")
            .alias(rule)
            for rule, cond in _RULES
        ]
    )
    tall = wide.unpivot(
        ids=[], values=[r for r, _ in _RULES],
        variableColumnName="rule", valueColumnName="n_violations",
    )
    return tall.select("rule", "n_violations", (F.col("n_violations") == 0).alias("pass"))


def _profile_oracle() -> str:
    per_col = []
    for c in _PROFILE_COLS:
        per_col.append(f"""
        SELECT '{c}' AS "column", 'nulls' AS metric,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS value,
               CAST(count(*) AS BIGINT) AS n_rows FROM lineitem
        UNION ALL
        SELECT '{c}', 'distinct', CAST(count(DISTINCT {c}) AS DOUBLE),
               CAST(count(*) AS BIGINT) FROM lineitem
        UNION ALL
        SELECT '{c}', 'min', CAST(min({c}) AS DOUBLE),
               CAST(count(*) AS BIGINT) FROM lineitem
        UNION ALL
        SELECT '{c}', 'max', CAST(max({c}) AS DOUBLE),
               CAST(count(*) AS BIGINT) FROM lineitem
        UNION ALL
        SELECT '{c}', 'mean', CAST(round(avg({c}), 4) AS DOUBLE),
               CAST(count(*) AS BIGINT) FROM lineitem
        """)
    return " UNION ALL ".join(per_col)


def profile_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy + distinct cardinality per categorical column of
    the event stream — the information-content profile a curation pipeline
    reads before choosing mixture/partition keys.

    Spark-first shape: ONE scan — every row stacks into (column, value)
    pairs map-side, then two hash aggs (value counts, then per-column
    −Σ p·ln p). Both shuffles key on the stacked column name + value; the
    second moves |columns| × |distinct| partials only. At 100 TB the
    per-column distinct sets dominate — the stack keeps it one pass where
    naive per-column profiling would rescan the table per column."""
    ev = load_table(spark, sf_dir, "events")
    stacked = ev.select(
        F.expr(
            "stack(3, 'event_type', event_type,"
            " 'user_id', cast(user_id AS string),"
            " 'event_day', cast(to_date(ts) AS string)) AS (col, val)"
        )
    )
    counts = stacked.groupBy("col", "val").agg(F.count("*").alias("c"))
    totals = counts.groupBy("col").agg(F.sum("c").alias("n"))
    return (
        counts.join(totals, "col")
        .groupBy("col")
        .agg(
            F.count("*").cast("long").alias("n_distinct"),
            F.round(
                -F.sum((F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("n"))), 6
            ).alias("entropy"),
        )
        .orderBy("col")
    )


def _entropy_oracle() -> str:
    return """
        WITH stacked AS (
            SELECT 'event_type' AS col, event_type AS val FROM events
            UNION ALL
            SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
            UNION ALL
            SELECT 'event_day', CAST(CAST(ts AS DATE) AS VARCHAR) FROM events
        ),
        counts AS (
            SELECT col, val, count(*) AS c FROM stacked GROUP BY col, val
        ),
        totals AS (
            SELECT col, sum(c) AS n FROM counts GROUP BY col
        )
        SELECT counts.col AS col,
               CAST(count(*) AS BIGINT) AS n_distinct,
               round(-sum((c * 1.0 / n) * ln(c * 1.0 / n)), 6) AS entropy
        FROM counts JOIN totals ON counts.col = totals.col
        GROUP BY counts.col
        ORDER BY counts.col
    """


def _dq_oracle() -> str:
    parts = [
        f"""SELECT '{rule}' AS rule,
               CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violations,
               (sum(CASE WHEN {cond} THEN 1 ELSE 0 END) = 0) AS pass
            FROM lineitem"""
        for rule, cond in _RULES
    ]
    return " UNION ALL ".join(parts)


QUERIES = {
    "profile_table_stats": profile_table_stats,
    "dq_constraint_check": dq_constraint_check,
    "profile_column_entropy": profile_column_entropy,
}

ORACLE = {
    "profile_table_stats": _profile_oracle(),
    "dq_constraint_check": _dq_oracle(),
    "profile_column_entropy": _entropy_oracle(),
}


_FK_CHECKS = (
    ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey -> part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey -> supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey -> nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey -> nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
)


def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the star schema — the referential
    cousin of ``dq_constraint_check``'s single-table rules, and the first
    thing a warehouse DQ suite verifies after a load. One LEFT ANTI join
    per declared FK (child minus matching parents = orphans), each
    broadcast-gated on the dimension side; counts are exact integers.
    A healthy fixture passes every check — the key's value is that the
    oracle recomputes each orphan count independently, so a broken join
    key or a silently-pruned dimension flips the hash."""
    rows = []
    for name, child_t, child_k, parent_t, parent_k in _FK_CHECKS:
        child = load_table(spark, sf_dir, child_t).select(
            F.col(child_k).alias("k")
        )
        parent = load_table(spark, sf_dir, parent_t).select(
            F.col(parent_k).alias("k")
        ).distinct()
        n_child = child.count()
        n_orphans = child.join(maybe_broadcast(parent), "k", "left_anti").count()
        rows.append((name, n_child, n_orphans, n_orphans == 0))
    return spark.createDataFrame(
        rows, "fk string, n_child_rows long, n_orphans long, pass boolean"
    ).orderBy("fk")


QUERIES["dq_referential_integrity"] = dq_referential_integrity
ORACLE["dq_referential_integrity"] = " UNION ALL ".join(
    f"""
    SELECT '{name}' AS fk,
           CAST((SELECT count(*) FROM {child_t}) AS BIGINT) AS n_child_rows,
           CAST((SELECT count(*) FROM {child_t} c
                 WHERE NOT EXISTS (SELECT 1 FROM {parent_t} p
                                   WHERE p.{parent_k} = c.{child_k}))
                AS BIGINT) AS n_orphans,
           (SELECT count(*) FROM {child_t} c
            WHERE NOT EXISTS (SELECT 1 FROM {parent_t} p
                              WHERE p.{parent_k} = c.{child_k})) = 0 AS pass
    """
    for name, child_t, child_k, parent_t, parent_k in _FK_CHECKS
) + " ORDER BY fk"
