"""Differential tests: every registered query vs its DuckDB oracle twin at
sf0.01 — a strict local mirror of the driver's correctness gate.
Keys without an oracle get a rows-only sanity check (runs, has rows).
"""

from __future__ import annotations

import pytest

from flink_streaming_gnn_spark import registry
from tests.conftest import SF_ORACLE
from tests.oracle_compare import compare_frames

_QUERIES = registry.all_queries()
_ORACLE = registry.all_oracle_sql()

_ORACLE_KEYS = sorted(k for k in _QUERIES if k in _ORACLE)
_ROWS_ONLY_KEYS = sorted(k for k in _QUERIES if k not in _ORACLE)


@pytest.mark.parametrize("key", _ORACLE_KEYS)
def test_oracle_match(spark, duck, key):
    sdf = _QUERIES[key](spark, SF_ORACLE)
    spark_pdf = sdf.toPandas()
    oracle_pdf = duck.execute(_ORACLE[key]).fetchdf()
    problems = compare_frames(spark_pdf, oracle_pdf, key)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("key", _ROWS_ONLY_KEYS)
def test_rows_only(spark, key):
    sdf = _QUERIES[key](spark, SF_ORACLE)
    n = sdf.count()
    assert n >= 0
    assert len(sdf.schema.fields) > 0


# ---------------------------------------------------------------------------
# SQL entry-point parity (SURVEY.md §3.2 E2 lifecycle): the same logical
# query expressed via spark.sql() over register_views() must equal the
# DataFrame-built registry plan — proving the SQL surface is a real entry
# point, not a parallel implementation.

_SQL_PARITY = {
    "agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                   AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "join_3way_revenue": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY revenue DESC
    """,
    "dedup_exact": """
        SELECT text,
               CAST(min(doc_id) AS BIGINT) AS canonical_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM documents
        GROUP BY text
    """,
}


@pytest.mark.parametrize("key", sorted(_SQL_PARITY))
def test_sql_entry_point_parity(spark, key):
    from flink_streaming_gnn_spark.sources.tables import register_views

    register_views(spark, SF_ORACLE)
    sql_pdf = spark.sql(_SQL_PARITY[key]).toPandas()
    df_pdf = _QUERIES[key](spark, SF_ORACLE).toPandas()
    problems = compare_frames(sql_pdf, df_pdf, f"sql-parity:{key}")
    assert not problems, "\n".join(problems)
