"""Advanced SQL-surface entry points (SURVEY.md §3.2 E2 lifecycle — the
query shapes a SQL-first user writes verbatim, run through ``spark.sql``
over ``register_views``; the oracle is the SAME SQL string, so both
engines' rewrites must agree on semantics exactly, like
``sql_correlated_exists``):

* ``sql_recursive_cte`` — ``WITH RECURSIVE`` bounded graph reachability
  (hop ≤ 2 from a seed slice of the purchase graph) — the iterative-query
  surface Spark 4 added natively; the same traversal the DataFrame-side
  ``graph_bfs_levels`` runs as a driver loop, here expressed once and
  executed by the engine's recursion operator.
* ``sql_lateral_topn`` — correlated ``LATERAL`` subquery with per-row
  ORDER BY/LIMIT (top-2 customers per nation) — Catalyst decorrelates
  into a DomainJoin/window; the classic "top-N per key in plain SQL"
  entry point next to the DataFrame-side ``topk_per_group``.

At 100 TB: the recursion's per-step frontier join is the same plan the
explicit BFS builds (equi-join + dedup per round); LATERAL top-N
decorrelates to the WindowGroupLimit shape, never a per-row re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SEED_MOD = 100
EMB_MOD = 500

_SQL_RECURSIVE = f"""
    WITH RECURSIVE e AS (
        SELECT DISTINCT o_custkey % {EMB_MOD} AS src_v,
                        l_suppkey % {EMB_MOD} AS dst_v
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    reach(v, hop) AS (
        SELECT src_v AS v, CAST(0 AS BIGINT) AS hop
        FROM (SELECT DISTINCT src_v FROM e WHERE src_v % {SEED_MOD} = 0)
        UNION ALL
        SELECT e.dst_v AS v, r.hop + 1 AS hop
        FROM reach r JOIN e ON e.src_v = r.v
        WHERE r.hop < 2
    )
    SELECT v, CAST(min(hop) AS BIGINT) AS first_hop,
           CAST(count(*) AS BIGINT) AS n_paths
    FROM reach GROUP BY v
"""

_SQL_LATERAL = """
    SELECT n_name, c.c_name, c.c_acctbal
    FROM nation, LATERAL (
        SELECT c_name, c_acctbal
        FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_name
        LIMIT 2
    ) c
"""


# Spark SQL native PIVOT syntax (the wide-table entry point a BI user
# writes; the engine plans it as the same Expand/conditional-agg shape as
# the DataFrame groupBy().pivot()). DuckDB's PIVOT grammar differs, so the
# oracle is the semantically-identical conditional aggregation — which is
# also exactly what both engines lower PIVOT to.
_TYPES = ("click", "error", "purchase", "signup", "view")

_SQL_PIVOT = f"""
    SELECT * FROM (
        SELECT user_id % 100 AS user_mod, event_type, value FROM events
    )
    PIVOT (
        round(sum(value), 2) FOR event_type IN
        ({", ".join(f"'{t}' AS {t}" for t in _TYPES)})
    )
"""

_SQL_PIVOT_ORACLE = f"""
    SELECT user_id % 100 AS user_mod,
           {", ".join(
               f"round(sum(value) FILTER (WHERE event_type = '{t}'), 2) AS {t}"
               for t in _TYPES
           )}
    FROM events GROUP BY user_id % 100
"""


def sql_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_streaming_gnn_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_PIVOT)


def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_streaming_gnn_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_RECURSIVE)


def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_streaming_gnn_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_LATERAL)


QUERIES = {
    "sql_recursive_cte": sql_recursive_cte,
    "sql_lateral_topn": sql_lateral_topn,
    "sql_pivot_wide": sql_pivot_wide,
}

ORACLE = {
    "sql_recursive_cte": _SQL_RECURSIVE,
    "sql_lateral_topn": _SQL_LATERAL,
    "sql_pivot_wide": _SQL_PIVOT_ORACLE,
}
