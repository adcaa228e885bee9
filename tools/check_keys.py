"""Spot-check named registry keys against their DuckDB oracle at sf0.01
(same canonicalization as tools/driver_sim.py). Usage:
    python tools/check_keys.py key1 key2 ...
"""
import hashlib
import importlib.util
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")

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
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
    )


def canon(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(tuple(str(v) for v in r) for r in pdf[cols].itertuples(index=False, name=None))
    return cols, hashlib.md5(repr(rows).encode()).hexdigest(), len(rows)


qs, osql = mod.queries(), mod.oracle_sql()
fail = 0
for key in sys.argv[1:]:
    sdf = qs[key](spark, SF_DIR).toPandas()
    if key not in osql:
        print(f"ROWS-ONLY {key}: {len(sdf)} rows")
        continue
    odf = con.execute(osql[key]).fetchdf()
    sc, sh, sn = canon(sdf)
    oc, oh, on = canon(odf)
    ok = sc == oc and sn == on and sh == oh
    print(f"{'OK' if ok else 'FAIL'} {key}: spark={sn} oracle={on} cols_eq={sc == oc} hash_eq={sh == oh}")
    if not ok:
        fail += 1
        if sc != oc:
            print(f"  spark cols: {sc}\n  oracle cols: {oc}")
        else:
            import pandas as pd
            m = sdf.merge(odf, how="outer", indicator=True)
            print(m[m["_merge"] != "both"].head(10))
sys.exit(1 if fail else 0)
