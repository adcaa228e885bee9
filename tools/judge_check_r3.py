"""Judge round-3 spot check: run the never-driver-attested keys at sf0.01
against their DuckDB oracles (same canonicalization as tools/driver_sim.py)."""
import hashlib, importlib.util, json, sys, time
import duckdb

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)

from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')")

def canon(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(tuple(str(v) for v in r) for r in pdf[cols].itertuples(index=False, name=None))
    return cols, hashlib.md5(repr(rows).encode()).hexdigest(), len(rows)

qs, osql = mod.queries(), mod.oracle_sql()
attested = set()
for r in ("01","02","03"):
    attested |= set(json.load(open(f"/root/repo/CORRECTNESS_r{r}.json")))
targets = [k for k in qs if k not in attested]
print(f"checking {len(targets)} never-attested keys", flush=True)
results = {}
for key in targets:
    t0 = time.perf_counter()
    try:
        sdf = qs[key](spark, "/root/testdata/sf0.01").toPandas()
    except Exception as e:
        results[key] = {"status": "ERROR", "err": str(e)[:300]}
        print(f"ERROR {key}: {str(e)[:160]}", flush=True)
        continue
    dt = time.perf_counter() - t0
    if key not in osql:
        results[key] = {"status": "rows_only", "rows": len(sdf), "secs": round(dt,1)}
        print(f"ROWS-ONLY {key}: {len(sdf)} rows [{dt:.1f}s]", flush=True)
        continue
    try:
        odf = con.execute(osql[key]).fetchdf()
    except Exception as e:
        results[key] = {"status": "ORACLE_ERR", "err": str(e)[:300]}
        print(f"ORACLE_ERR {key}: {str(e)[:160]}", flush=True)
        continue
    sc, sh, sn = canon(sdf); oc, oh, on = canon(odf)
    ok = sc == oc and sn == on and sh == oh
    results[key] = {"status": "PASS" if ok else "FAIL", "rows": sn, "oracle_rows": on,
                    "cols_match": sc == oc, "hash_match": sh == oh, "secs": round(dt,1)}
    print(f"{'PASS' if ok else 'FAIL'} {key} [{dt:.1f}s]", flush=True)

n_pass = sum(1 for v in results.values() if v["status"] == "PASS")
n_fail = sum(1 for v in results.values() if v["status"] in ("FAIL","ERROR","ORACLE_ERR"))
n_ro = sum(1 for v in results.values() if v["status"] == "rows_only")
print(f"SUMMARY: {n_pass} pass, {n_ro} rows-only, {n_fail} fail/err of {len(targets)}")
json.dump(results, open("/root/repo/tools/judge_check_r3_results.json","w"), indent=1)
