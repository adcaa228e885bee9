"""Round-6 hardening tests.

NULL-discipline (ADVICE r5 #3, generalized): the distributed-cumsum
rank statistics (`dq_mann_whitney`, `dq_ks_drift`) filter
``value IS NOT NULL`` in BOTH formulations because the engines disagree
on NULL sort order (Spark first, DuckDB last) and a NULL group would
silently land in bucket 0 of the quantile-boundary bucketing. The
corpus fixtures carry no NULLs, so the driver differential can never
exercise the divergence — these tests build a fixture WITH NULL values
and run the full Spark-vs-DuckDB differential on it.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare_frames


@pytest.fixture(scope="module")
def nullable_events_dir(spark, tmp_path_factory):
    """A copy of the smoke events fixture with NULL `value` rows mixed
    into both compared event types (and a NULL-value row of an excluded
    type, to catch over-filtering)."""
    from pyspark.sql import functions as F

    from flink_streaming_gnn_spark.sources.tables import load_table

    out = str(tmp_path_factory.mktemp("nullable_sf"))
    ev = load_table(spark, SF_SMOKE, "events")
    nulled = ev.limit(40).withColumn(
        "value",
        F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(
            F.col("value")
        ),
    )
    ev.unionByName(nulled).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    return out


def _differential(spark, sf_dir: str, key: str):
    from flink_streaming_gnn_spark import registry

    spark_pdf = registry.all_queries()[key](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'events.parquet')}/*.parquet'"
    )
    oracle_pdf = con.execute(registry.all_oracle_sql()[key]).df()
    return compare_frames(spark_pdf, oracle_pdf, key)


def test_mann_whitney_null_values_differential(spark, nullable_events_dir):
    problems = _differential(spark, nullable_events_dir, "dq_mann_whitney")
    assert not problems, problems


def test_ks_drift_null_values_differential(spark, nullable_events_dir):
    problems = _differential(spark, nullable_events_dir, "dq_ks_drift")
    assert not problems, problems


def test_null_rows_actually_present(spark, nullable_events_dir):
    # guard: the fixture must really contain NULL values for the two
    # compared types, or the tests above prove nothing
    from pyspark.sql import functions as F

    from flink_streaming_gnn_spark.sources.tables import load_table

    ev = load_table(spark, nullable_events_dir, "events")
    n = (
        ev.filter(
            F.col("value").isNull()
            & F.col("event_type").isin(["click", "view"])
        )
    ).count()
    assert n > 0
