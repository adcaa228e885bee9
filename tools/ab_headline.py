#!/usr/bin/env python
"""Interleaved HEAD-vs-ref A/B over the bench HEADLINE set at sf0.1 (the
graded scale), for code changes whose effect is a per-query constant —
round 9's load_table schema memo (driver-side plan-build floor).

Methodology = tools/ab_probe.py (fresh JVM per arm per round, idle-gated,
detached worktree for the baseline) with two deltas:

1. each arm replicates bench.py's shape: one untimed warmup pass over the
   whole headline set, then best-of-2 timed noop materializations per key
   (plan build + execution, like the official bench);
2. ARM ORDER ALTERNATES per round (round 1: HEAD first; round 2: baseline
   first; ...) — the round-9 zstd A/B proved this box's first-arm-after-
   idle bias can fabricate a 2x "win" (tools/ab_r9_zstd_reversed.log), so
   the order reversal is built in rather than left to discipline.

Usage:
    python tools/ab_headline.py <baseline-ref> [--rounds N] [--sf-dir D]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ab_probe import _wait_idle  # noqa: E402

_ARM_BODY = r"""
import sys, time
tree, sf_dir = sys.argv[1], sys.argv[2]
sys.path.insert(0, tree)
from flink_streaming_gnn_spark import registry
from flink_streaming_gnn_spark.session import get_spark

HEADLINE = (
    "agg_pricing_summary", "join_3way_revenue", "window_topk_per_group",
    "tumbling_window_events", "graph_2hop_neighbor_agg", "semi_anti",
    "text_tokenize_tf", "vector_knn_cosine", "dedup_exact",
    "sessionize_approx",
)

spark = get_spark("ab_headline")
queries = registry.all_queries()

def mat(name):
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

for name in HEADLINE:  # untimed warmup, like bench.py
    mat(name)
total = 0.0
for name in HEADLINE:
    best = None
    for _ in range(2):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        mat(name)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    total += best
    print(f"{name}: {best:.3f}s", flush=True)
print(f"TOTAL: {total:.3f}s", flush=True)
"""


def _run_arm(tree: str, sf_dir: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", _ARM_BODY, tree, sf_dir],
        capture_output=True,
        text=True,
        cwd=tempfile.gettempdir(),  # foreign cwd, like the driver
    )
    parts = [out.stdout.strip()]
    if out.returncode != 0:
        parts.append(f"ARM FAILED (exit {out.returncode})")
    if out.returncode != 0 or not out.stdout.strip():
        parts.append(out.stderr.strip()[-400:])
    return "\n".join(p for p in parts if p)


def main() -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ref", help="git ref for the baseline arm")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ns = p.parse_args()
    base = tempfile.mkdtemp(prefix="ab_headline_base_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", base, ns.ref],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    try:
        for r in range(1, ns.rounds + 1):
            arms = (("HEAD", REPO), (ns.ref, base))
            if r % 2 == 0:  # alternate order to cancel first-arm bias
                arms = arms[::-1]
            for label, tree in arms:
                _wait_idle()
                with open("/proc/loadavg") as f:
                    load = f.read().split()[0]
                print(f"--- round {r} arm {label} (load {load}):", flush=True)
                print(_run_arm(tree, ns.sf_dir), flush=True)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", base],
            cwd=REPO,
            capture_output=True,
        )


if __name__ == "__main__":
    main()
