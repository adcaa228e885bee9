#!/usr/bin/env python
"""Dump `.explain("formatted")` for a set of registry keys to files.

Usage:
    python tools/dump_plans.py <out_dir> [key ...]

Defaults to the bench HEADLINE set when no keys are given. Writes
``<out_dir>/<key>.txt`` with the formatted physical plan (the judge-facing
evidence for plan-shape claims in OPTIMIZATION_r*.md). Uses the same
session and sf_dir the bench uses, so the captured plan is the plan the
bench times (AQE initial plan; isFinalPlan=false is expected).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_streaming_gnn_spark import registry  # noqa: E402
from flink_streaming_gnn_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir = sys.argv[1]
    keys = sys.argv[2:]
    if not keys:
        import bench

        keys = list(bench.HEADLINE)
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_plans")
    queries = registry.all_queries()
    for key in keys:
        df = queries[key](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{key}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{key}: {len(plan)} chars", flush=True)


if __name__ == "__main__":
    main()
