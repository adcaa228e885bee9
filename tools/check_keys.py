#!/usr/bin/env python
"""Filtered driver simulation: `python tools/check_keys.py key1 key2 ...`
runs only the named queries() keys at sf0.01 against their oracle_sql()
twins (same canonicalization as tools/driver_sim.py). Fast feedback loop
while iterating on individual operators."""
import hashlib
import importlib.util
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
    )


def canon(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(str(v) for v in r) for r in pdf[cols].itertuples(index=False, name=None)
    )
    return cols, hashlib.md5(repr(rows).encode()).hexdigest(), len(rows)


qs, osql = mod.queries(), mod.oracle_sql()
keys = sys.argv[1:] or list(qs)[:50]
n_fail = 0
for key in keys:
    t0 = time.perf_counter()
    sdf = qs[key](spark, SF_DIR).toPandas()
    dt = time.perf_counter() - t0
    if key not in osql:
        print(f"ROWS-ONLY {key}: {len(sdf)} rows [{dt:.1f}s]")
        continue
    odf = con.execute(osql[key]).fetchdf()
    sc, sh, sn = canon(sdf)
    oc, oh, on = canon(odf)
    if sc == oc and sn == on and sh == oh:
        print(f"OK   {key}: {sn} rows [{dt:.1f}s]")
    else:
        n_fail += 1
        print(f"FAIL {key}: cols {sc == oc} n {sn}vs{on} hash {sh == oh} [{dt:.1f}s]")
print(f"{len(keys) - n_fail}/{len(keys)} pass")
sys.exit(1 if n_fail else 0)
