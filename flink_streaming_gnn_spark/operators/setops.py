"""Set operations: UNION [ALL] / INTERSECT / EXCEPT [ALL] (SURVEY.md §2B)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _cust_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").cast("long").alias("nationkey"))
    )


def _supp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").cast("long").alias("nationkey"))
    )


def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no shuffle) + a tag column per source side."""
    c = _cust_nations(spark, sf_dir).withColumn("side", F.lit("customer"))
    s = _supp_nations(spark, sf_dir).withColumn("side", F.lit("supplier"))
    return c.unionByName(s)


def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union all + hash dedup on the combined key."""
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — nations having both customers and suppliers."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — nations with customers but no suppliers."""
    return _cust_nations(spark, sf_dir).exceptAll(
        _supp_nations(spark, sf_dir)
    ).distinct()


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference (keeps multiplicity)."""
    return _cust_nations(spark, sf_dir).exceptAll(_supp_nations(spark, sf_dir))


QUERIES = {
    "set_union_all": set_union_all,
    "set_union_distinct": set_union_distinct,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "set_except_all": set_except_all,
}

ORACLE = {
    "set_union_all": """
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey, 'customer' AS side FROM customer
        UNION ALL
        SELECT CAST(s_nationkey AS BIGINT) AS nationkey, 'supplier' AS side FROM supplier
    """,
    "set_union_distinct": """
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        UNION
        SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    "set_intersect": """
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        INTERSECT
        SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    "set_except": """
        SELECT DISTINCT nationkey FROM (
            SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
            EXCEPT ALL
            SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
        )
    """,
    "set_except_all": """
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        EXCEPT ALL
        SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
}
