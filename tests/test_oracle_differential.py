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
