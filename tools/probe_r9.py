#!/usr/bin/env python
"""Round-9 scale probes (VERDICT r8 "Next round" #1 and #4).

Modes:

  --x100 K [K…]   per-key subprocess JVM against the merged ×100 corpus
                  (probe_r8 build reused), now printing the DRIVER JVM
                  heap (post-GC used / max) after the run — the item-1
                  done-condition: the four re-drained e2e keys must pass
                  with a BOUNDED driver heap, proving the parquet spool
                  replaced the driver-memory sink. Default keys: the
                  four keys spooled this round.
  --soak-x100     the 14 end-to-end streaming keys SEQUENTIALLY in ONE
                  JVM against the merged ×100 corpus (the r8 soak ran at
                  ×10): catches cross-query state-store / spool leak
                  accumulation that per-key subprocess isolation
                  structurally cannot see. Prints per-key wall + post-GC
                  heap; the ledger claim is a stable heap plateau across
                  the sequence, no growth trend.
  --x1000-stream K [K…]  the ×1000 ladder (VERDICT r8 #5) for
                  EVENTS-ONLY streaming keys: replicate the ×100 events
                  table one more decade (→ ~10⁹ events, third-decade key
                  stride), merge-symlink the rest at ×100, then run each
                  key in its own subprocess JVM with the heap readout.
                  Default keys: the three slowest ×100 streaming keys
                  (decayed-memory / scd2 / cep-funnel, post-spool).

Ledger discipline: stdout is the record — redirect to
tools/probe_r9_<mode>.log and commit the log. NEVER compare walls
against a prior round's recording (box swing ±15-50%); perf CLAIMS need
an interleaved tools/ab_probe.py run.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from probe_r8 import SOAK_KEYS, _jvm_heap_mb, build_x100  # noqa: E402

# the four keys re-drained through parquet spools this round
SPOOLED_KEYS = (
    "stream_sliding_e2e",
    "stream_gnn_sage_e2e",
    "stream_decayed_memory_e2e",
    "stream_cep_funnel_e2e",
)

_CHILD_BODY = r"""
import sys, time
repo, sf_dir, key = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)
from flink_streaming_gnn_spark import registry
from flink_streaming_gnn_spark.session import get_spark
spark = get_spark("probe_r9_x100")
t0 = time.perf_counter()
registry.all_queries()[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
wall = time.perf_counter() - t0
# Collect Python-side py4j proxy cycles BEFORE the JVM heap readout: the
# readout's question is RETAINED residue, and uncollected CPython cycles
# (DataFrame proxies pin JVM objects until a full gen2 collection) are
# ordinary garbage, not retention — without this, the reading mixes the
# two (measured: ~700 MiB of post-System.gc() heap that one gc.collect()
# releases). Structural retention (e.g. a memory sink's session-lifetime
# temp table) is unaffected by this and still shows.
import gc
gc.collect()
spark.sparkContext._jvm.java.lang.System.gc()
rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
used = (rt.totalMemory() - rt.freeMemory()) / (1 << 20)
cap = rt.maxMemory() / (1 << 20)
print(f"{key}: {wall:.1f}s  heap {used:.0f}/{cap:.0f} MiB", flush=True)
"""


def run_x100(keys: list[str]) -> int:
    merged = build_x100()
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


X1000_STREAM_KEYS = (
    "stream_decayed_memory_e2e",
    "stream_scd2_e2e",
    "stream_cep_funnel_e2e",
)
_KEY_SHIFT3 = 10_000_000_000_000  # above the ×100 key space
_ALL_TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings"
).split()


def build_x1000_events() -> str:
    """×1000 events (10 copies of the ×100 events with a third-decade
    key stride on event_id/user_id) + merged symlink dir where every
    other table stays ×100. Cached + atomic-publish (probe_r8 shape)."""
    import shutil

    from pyspark.sql import functions as F

    from flink_streaming_gnn_spark.session import get_spark

    x100_merged = build_x100()
    x100 = x100_merged[: -len("_merged")]
    digest = os.path.basename(x100).rsplit("_", 1)[-1]
    out_dir = os.path.join(tempfile.gettempdir(), f"graft_r9x1000ev_{digest}")
    merged = out_dir + "_merged"
    if os.path.isdir(out_dir) and os.path.isdir(merged):
        return merged
    spark = get_spark("probe_r9_build_x1000")
    if not os.path.isdir(out_dir):
        staging = tempfile.mkdtemp(
            prefix=f"graft_r9x1000ev_{digest}_", dir=tempfile.gettempdir()
        )
        df = spark.read.parquet(os.path.join(x100, "events.parquet"))
        copies = []
        for i in range(10):
            copies.append(
                df.withColumn(
                    "event_id",
                    (F.col("event_id") + F.lit(i * _KEY_SHIFT3)).cast("long"),
                ).withColumn(
                    "user_id",
                    (F.col("user_id") + F.lit(i * _KEY_SHIFT3)).cast("long"),
                )
            )
        out = copies[0]
        for p in copies[1:]:
            out = out.unionByName(p)
        out.repartition(128).write.mode("overwrite").parquet(
            os.path.join(staging, "events.parquet")
        )
        try:
            os.rename(staging, out_dir)
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)
    if not os.path.isdir(merged):
        staging = tempfile.mkdtemp(
            prefix=f"graft_r9x1000ev_{digest}_merged_",
            dir=tempfile.gettempdir(),
        )
        for t in _ALL_TABLES:
            src = os.path.join(
                out_dir if t == "events" else x100_merged, f"{t}.parquet"
            )
            os.symlink(
                os.path.realpath(src), os.path.join(staging, f"{t}.parquet")
            )
        try:
            os.rename(staging, merged)
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)
    return merged


def run_x1000_stream(keys: list[str]) -> int:
    merged = build_x1000_events()
    print(f"x1000 merged dir: {merged}", flush=True)
    failures = 0
    for key in keys:
        t0 = time.perf_counter()
        out = subprocess.run(
            [sys.executable, "-c", _CHILD_BODY, REPO, merged, key],
            capture_output=True,
            text=True,
            cwd=tempfile.gettempdir(),
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


def run_soak_x100() -> int:
    from flink_streaming_gnn_spark import registry
    from flink_streaming_gnn_spark.session import get_spark

    merged = build_x100()
    print(f"x100 merged dir: {merged}", flush=True)
    spark = get_spark("probe_r9_soak")
    queries = registry.all_queries()
    failures = 0
    for key in SOAK_KEYS:
        t0 = time.perf_counter()
        try:
            queries[key](spark, merged).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
            # py4j-cycle collection before the readout — see _CHILD_BODY
            import gc

            gc.collect()
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
    if args[:1] == ["--x100"]:
        raise SystemExit(run_x100(args[1:] or list(SPOOLED_KEYS)))
    elif args[:1] == ["--soak-x100"]:
        raise SystemExit(run_soak_x100())
    elif args[:1] == ["--x1000-stream"]:
        raise SystemExit(run_x1000_stream(args[1:] or list(X1000_STREAM_KEYS)))
    else:
        raise SystemExit(__doc__)


if __name__ == "__main__":
    main()
