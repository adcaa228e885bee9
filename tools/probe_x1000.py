#!/usr/bin/env python
"""One-off ×1000 amortization probe for the worst residual-ratio query
(semi_anti): replicate customer/orders one more decade beyond the ×100
corpus (orders 150M rows, customer 15M) and time the anti join in both
engines on the same parquet. Documents the crossing point the ×10/×100
bench sections trend toward; run manually, results recorded in README.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time

import duckdb

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_streaming_gnn_spark import registry  # noqa: E402
from flink_streaming_gnn_spark.session import get_spark  # noqa: E402

KEY_SHIFT3 = 10_000_000_000_000  # above the x100 key space


def build(spark, blown100: str) -> str:
    from pyspark.sql import functions as F

    out_dir = os.path.join(tempfile.gettempdir(), "graft_blown1000")
    if os.path.isdir(out_dir):
        return out_dir
    staging = tempfile.mkdtemp(prefix="graft_blown1000_", dir=tempfile.gettempdir())
    for t, cols in {
        "customer": ("c_custkey",),
        "orders": ("o_orderkey", "o_custkey"),
    }.items():
        df = spark.read.parquet(os.path.join(blown100, f"{t}.parquet"))
        copies = []
        for i in range(10):
            d = df
            for c in cols:
                d = d.withColumn(c, (F.col(c) + F.lit(i * KEY_SHIFT3)).cast("long"))
            copies.append(d)
        out = copies[0]
        for p in copies[1:]:
            out = out.unionByName(p)
        out.repartition(64).write.mode("overwrite").parquet(
            os.path.join(staging, f"{t}.parquet")
        )
    try:
        os.rename(staging, out_dir)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
    return out_dir


def main() -> None:
    blown100 = [d for d in glob.glob("/tmp/graft_blown100_*") if not d.endswith("_merged")]
    if not blown100:
        raise SystemExit("run bench.py first (needs the x100 cache)")
    spark = get_spark("probe_x1000")
    blown1000 = build(spark, blown100[0])
    # the semi_anti query only reads customer/orders, so a dir with just
    # those two tables is a valid sf_dir for it
    q = registry.all_queries()["semi_anti"]
    sql = registry.all_oracle_sql()["semi_anti"]

    def mat():
        q(spark, blown1000).write.format("noop").mode("overwrite").save()

    mat()  # warm
    best_s = 1e9
    for _ in range(2):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        mat()
        best_s = min(best_s, time.perf_counter() - t0)

    con = duckdb.connect()
    for t in ("customer", "orders"):
        files = sorted(glob.glob(os.path.join(blown1000, f"{t}.parquet", "*.parquet")))
        flist = ", ".join(f"'{f}'" for f in files)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet([{flist}])")
    con.execute(sql).fetchall()  # warm
    best_d = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best_d = min(best_d, time.perf_counter() - t0)

    print(
        f"x1000 semi_anti: spark={best_s:.2f}s duckdb={best_d:.2f}s "
        f"ratio={best_s / best_d:.2f}"
    )


if __name__ == "__main__":
    main()
