"""Run the driver's oracle differential for a SUBSET of keys (args), at an
optional sf dir (--sf=/root/testdata/sf0.01). Same canonicalization as
tools/driver_sim.py — use for fast iteration on individual keys."""
import hashlib
import importlib.util
import sys
import time

import duckdb

SF = "/root/testdata/sf0.01"
keys = []
for a in sys.argv[1:]:
    if a.startswith("--sf="):
        SF = a[5:]
    else:
        keys.append(a)

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
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
for t in [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )


def canon(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(str(v) for v in r)
        for r in pdf[cols].itertuples(index=False, name=None)
    )
    return cols, hashlib.md5(repr(rows).encode()).hexdigest(), len(rows)


qs, osql = mod.queries(), mod.oracle_sql()
fail = 0
for key in keys:
    t0 = time.perf_counter()
    sdf = qs[key](spark, SF).toPandas()
    dt = time.perf_counter() - t0
    if key not in osql:
        print(f"ROWS-ONLY {key}: {len(sdf)} rows [{dt:.1f}s]")
        continue
    odf = con.execute(osql[key]).fetchdf()
    sc, sh, sn = canon(sdf)
    oc, oh, on = canon(odf)
    ok = sc == oc and sn == on and sh == oh
    if ok:
        print(f"OK {key}: {sn} rows hash-match [{dt:.1f}s]")
    else:
        fail += 1
        print(f"FAIL {key}: cols {sc == oc} n {sn}vs{on} hash {sh == oh}")
        if sc != oc:
            print("  spark cols:", sc, "\n  oracle cols:", oc)
sys.exit(1 if fail else 0)
