#!/usr/bin/env python
"""Round-8 scale probes (VERDICT r7 "Next round" #3 and #8).

Modes:

  --build        build (or reuse) the ×100 probe corpus: the published
                 ×10 blown corpus's fact tables re-replicated ×10 with a
                 second-decade key stride (bench.py's _KEY_SHIFT2
                 discipline), plus a merged symlink dir so untouched
                 tables resolve to ×10.
  --x100 K [K…]  run each key against the merged ×100 dir in its OWN
                 subprocess JVM (crash/OOM isolation: a key that dies
                 must not take the ledger with it), print per-key wall.
                 Default keys: the ×10 top-10 from VERDICT r7.
  --x100-docs K… same, against the docs-tier merged dir (documents /
                 embeddings also ×10 beyond the ×10 corpus's boosted 100
                 copies → 5M docs / 2M vectors) for the dedup / text /
                 simsearch / tokenizer families.
  --soak         run the 14 end-to-end streaming keys SEQUENTIALLY in
                 ONE JVM against the ×10 corpus (state-store
                 accumulation + atexit spool/checkpoint interplay + JVM
                 memory health under sustained streaming load),
                 printing per-key wall and JVM heap after each key.

Ledger discipline: stdout is the record — redirect to
tools/probe_r8_<mode>.log and commit the log. NEVER compare these
walls against a prior round's recording (box swing ±15-50%); a perf
CLAIM needs an interleaved tools/ab_probe.py run.
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_PUBLISHED = re.compile(r"graft_blown_[0-9a-f]{12}$")

# the ×10 top-10 (VERDICT r7 "Next round" #3), slowest first
X100_KEYS = (
    "stream_cc_e2e",
    "graph_ppr_seeded",
    "graph_sage_pool_layer",
    "stream_gnn_sage_e2e",
    "graph_gin_layer",
    "graph_hits",
    "stream_outer_join_e2e",
    "graph_condensation_dag",
    "stream_scd2_e2e",
    "graph_closeness_centrality",
)

# the 14 true end-to-end streaming keys (README round-6 inventory)
SOAK_KEYS = (
    "stream_windowed_topk",
    "stream_cdc_snapshot",
    "stream_sliding_e2e",
    "stream_session_e2e",
    "stream_gnn_sage_e2e",
    "stream_decayed_memory_e2e",
    "stream_dedup_e2e",
    "stream_dedup_ttl_e2e",
    "stream_tumbling_append_e2e",
    "stream_cep_funnel_e2e",
    "stream_outer_join_e2e",
    "stream_scd2_e2e",
    "stream_cc_e2e",
    "stream_stream_interval_join",
)

# fact tables the top-10 read; dims + documents/embeddings stay ×10
_X100_TABLES = {
    "customer": ("c_custkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_suppkey", "l_partkey"),
    "events": ("event_id", "user_id"),
}
_KEY_SHIFT2 = 100_000_000_000  # above the ×10 key space (bench.py)
_ALL_TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings"
).split()


def _blown10() -> str:
    dirs = sorted(
        d for d in glob.glob("/tmp/graft_blown_*") if _PUBLISHED.search(d)
    )
    if not dirs:
        raise SystemExit("no published blown corpus cache; run bench.py first")
    return dirs[0]


def build_x100() -> str:
    """×100 fact tables + merged symlink dir; cached + atomic-publish."""
    blown10 = _blown10()
    digest = os.path.basename(blown10).rsplit("_", 1)[-1]
    out_dir = os.path.join(tempfile.gettempdir(), f"graft_r8x100_{digest}")
    merged = out_dir + "_merged"
    if os.path.isdir(out_dir) and os.path.isdir(merged):
        return merged
    from pyspark.sql import functions as F

    from flink_streaming_gnn_spark.session import get_spark

    spark = get_spark("probe_r8_build")
    if not os.path.isdir(out_dir):
        staging = tempfile.mkdtemp(
            prefix=f"graft_r8x100_{digest}_", dir=tempfile.gettempdir()
        )
        for t, cols in _X100_TABLES.items():
            df = spark.read.parquet(os.path.join(blown10, f"{t}.parquet"))
            copies = []
            for i in range(10):
                d = df
                for c in cols:
                    d = d.withColumn(
                        c, (F.col(c) + F.lit(i * _KEY_SHIFT2)).cast("long")
                    )
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
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
    if not os.path.isdir(merged):
        staging = tempfile.mkdtemp(
            prefix=f"graft_r8x100_{digest}_merged_", dir=tempfile.gettempdir()
        )
        for t in _ALL_TABLES:
            src = os.path.join(
                out_dir if t in _X100_TABLES else blown10, f"{t}.parquet"
            )
            os.symlink(src, os.path.join(staging, f"{t}.parquet"))
        try:
            os.rename(staging, merged)
        except OSError:
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
    return merged


# second build tier: documents/embeddings ×10 beyond the ×10 corpus's
# already-boosted 100 copies (→ 5M docs / 2M vectors) for the dedup /
# text / simsearch / tokenizer families; separate cache dir so the fact
# corpus above is not invalidated
_DOCS_TABLES = {"documents": ("doc_id",), "embeddings": ("vec_id",)}


def build_x100_docs() -> str:
    blown10 = _blown10()
    facts_merged = build_x100()
    digest = os.path.basename(blown10).rsplit("_", 1)[-1]
    out_dir = os.path.join(
        tempfile.gettempdir(), f"graft_r8x100docs_{digest}"
    )
    merged = out_dir + "_merged"
    if os.path.isdir(out_dir) and os.path.isdir(merged):
        return merged
    from pyspark.sql import functions as F

    from flink_streaming_gnn_spark.session import get_spark

    spark = get_spark("probe_r8_build_docs")
    if not os.path.isdir(out_dir):
        staging = tempfile.mkdtemp(
            prefix=f"graft_r8x100docs_{digest}_", dir=tempfile.gettempdir()
        )
        for t, cols in _DOCS_TABLES.items():
            df = spark.read.parquet(os.path.join(blown10, f"{t}.parquet"))
            copies = []
            for i in range(10):
                d = df
                for c in cols:
                    d = d.withColumn(
                        c, (F.col(c) + F.lit(i * _KEY_SHIFT2)).cast("long")
                    )
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
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
    if not os.path.isdir(merged):
        staging = tempfile.mkdtemp(
            prefix=f"graft_r8x100docs_{digest}_merged_",
            dir=tempfile.gettempdir(),
        )
        for t in _ALL_TABLES:
            src = os.path.join(
                out_dir if t in _DOCS_TABLES else facts_merged,
                f"{t}.parquet",
            )
            os.symlink(
                os.path.realpath(src), os.path.join(staging, f"{t}.parquet")
            )
        try:
            os.rename(staging, merged)
        except OSError:
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
    return merged


_CHILD_BODY = r"""
import sys, time
repo, sf_dir, key = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)
from flink_streaming_gnn_spark import registry
from flink_streaming_gnn_spark.session import get_spark
spark = get_spark("probe_r8_x100")
t0 = time.perf_counter()
registry.all_queries()[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
print(f"{key}: {time.perf_counter() - t0:.1f}s", flush=True)
"""


def run_x100(keys: list[str], docs: bool = False) -> int:
    merged = build_x100_docs() if docs else build_x100()
    print(f"x100 merged dir: {merged}", flush=True)
    failures = 0
    for key in keys:
        t0 = time.perf_counter()
        out = subprocess.run(
            [sys.executable, "-c", _CHILD_BODY, REPO, merged, key],
            capture_output=True,
            text=True,
            cwd=tempfile.gettempdir(),  # foreign cwd, like the driver
        )
        if out.returncode == 0:
            print(out.stdout.strip(), flush=True)
        else:
            failures += 1
            print(
                f"{key}: CHILD FAILED (exit {out.returncode},"
                f" {time.perf_counter() - t0:.1f}s)\n"
                + out.stderr.strip()[-600:],
                flush=True,
            )
    return failures


def _jvm_heap_mb(spark) -> tuple[float, float]:
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    used = (rt.totalMemory() - rt.freeMemory()) / (1 << 20)
    return used, rt.maxMemory() / (1 << 20)


def run_soak() -> int:
    from flink_streaming_gnn_spark import registry
    from flink_streaming_gnn_spark.session import get_spark

    blown10 = _blown10()
    spark = get_spark("probe_r8_soak")
    queries = registry.all_queries()
    failures = 0
    for key in SOAK_KEYS:
        t0 = time.perf_counter()
        try:
            queries[key](spark, blown10).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
            spark.sparkContext._jvm.java.lang.System.gc()
            used, cap = _jvm_heap_mb(spark)
            print(
                f"{key}: {wall:.1f}s  heap {used:.0f}/{cap:.0f} MiB",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — the ledger records
            failures += 1
            print(f"{key}: ERROR {str(exc)[:300]}", flush=True)
    return failures


def main() -> None:
    args = sys.argv[1:]
    if args[:1] == ["--build"]:
        print(build_x100())
    elif args[:1] == ["--soak"]:
        raise SystemExit(run_soak())
    elif args[:1] == ["--x100"]:
        raise SystemExit(run_x100(args[1:] or list(X100_KEYS)))
    elif args[:1] == ["--x100-docs"]:
        raise SystemExit(run_x100(args[1:], docs=True))
    else:
        raise SystemExit(__doc__)


if __name__ == "__main__":
    main()
