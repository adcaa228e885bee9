"""Round-9 floor optimization: load_table's inferred-schema memo.

The memo (sources/tables.py::_SCHEMA_CACHE) skips parquet schema INFERENCE
on repeat constructions of the same table — metadata only; the relation,
plan and rows must be bit-identical to a fresh inferred read. Pinned here:

1. repeat loads return the same schema/rows as the first (memo hit path);
2. the memo is keyed on content (path + mtime): rewriting a table in place
   invalidates the entry instead of serving a stale schema;
3. the events ts-rebuild (nanos → µs timestamp) survives the memo.

Round-9 E5 extends the same discipline one level up: load_table memoizes
the resolved DataFrame per (session, table, content) — same object back,
so the per-call relation-construction floor (file listing + Py4J) is paid
once per session. Pinned below: identity on repeat loads, and that the
in-place-rewrite invalidation (test 3) holds for the DataFrame memo too
(a stale hit there would serve the old projection's columns).
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources import tables
from flink_streaming_gnn_spark.sources.tables import load_table, table_path
from tests.conftest import SF_SMOKE


def test_memo_hit_identical_schema_and_rows(spark):
    tables._SCHEMA_CACHE.clear()
    tables._DF_CACHE.clear()
    first = load_table(spark, SF_SMOKE, "customer")
    assert (os.path.realpath(table_path(SF_SMOKE, "customer")),) == tuple(
        k[0] for k in tables._SCHEMA_CACHE
    ), "first load must populate the memo"
    second = load_table(spark, SF_SMOKE, "customer")  # memo-hit path
    assert second.schema == first.schema
    a = first.orderBy("c_custkey").collect()
    b = second.orderBy("c_custkey").collect()
    assert a == b


def test_events_ts_rebuild_survives_memo(spark):
    """events is the one table with a read-time type fixup (nanos → µs
    rebuild when the fixture is TIMESTAMP(NANOS)); whatever the fixture's
    encoding, the memo-hit load must equal the fresh inferred load."""
    tables._SCHEMA_CACHE.clear()
    tables._DF_CACHE.clear()
    fresh = load_table(spark, SF_SMOKE, "events")  # populates the memo
    hit = load_table(spark, SF_SMOKE, "events")  # memo hit
    assert hit.dtypes == fresh.dtypes
    assert dict(hit.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    n_fresh = fresh.filter(F.col("ts").isNotNull()).count()
    assert hit.filter(F.col("ts").isNotNull()).count() == n_fresh > 0


def test_inplace_rewrite_invalidates(spark, tmp_path):
    src = table_path(SF_SMOKE, "nation")  # a single parquet file
    dst = os.path.join(str(tmp_path), "nation.parquet")
    shutil.copy(src, dst)
    sf_dir = str(tmp_path)
    tables._SCHEMA_CACHE.clear()
    tables._DF_CACHE.clear()
    n1 = load_table(spark, sf_dir, "nation")
    cols1 = set(n1.columns)
    # rewrite the table in place with a different schema (projection)
    n1.select("n_nationkey", "n_name").write.mode("overwrite").parquet(dst + ".new")
    os.remove(dst)
    os.rename(dst + ".new", dst)
    # ensure mtime_ns actually moved (fs granularity)
    now = time.time_ns()
    os.utime(dst, ns=(now, now))
    n2 = load_table(spark, sf_dir, "nation")
    assert set(n2.columns) == {"n_nationkey", "n_name"} != cols1


def test_df_memo_returns_same_object(spark):
    """E5: a repeat load on the same session IS the first DataFrame (the
    memo's whole point — zero relation re-construction), and a different
    table or a cleared memo yields a fresh object."""
    tables._DF_CACHE.clear()
    first = load_table(spark, SF_SMOKE, "customer")
    assert load_table(spark, SF_SMOKE, "customer") is first
    assert load_table(spark, SF_SMOKE, "orders") is not first
    tables._DF_CACHE.clear()
    assert load_table(spark, SF_SMOKE, "customer") is not first
