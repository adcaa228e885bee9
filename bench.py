#!/usr/bin/env python
"""Benchmark harness — runs the BASELINE.md headline queries and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Inputs: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query is timed end-to-end (plan build +
execution) with the result fully materialized executor-side via the noop
sink — no driver collect, so the number reflects the distributed plan, not
Py4J transfer. A warmup query first absorbs JVM/codegen startup so the
per-query numbers are comparable to the warm-cache DuckDB baseline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_streaming_gnn_spark import registry  # noqa: E402
from flink_streaming_gnn_spark.session import get_spark  # noqa: E402

# BASELINE.md Tier-1 headline set (same names, same sf).
HEADLINE = (
    "agg_pricing_summary",
    "join_3way_revenue",
    "window_topk_per_group",
    "tumbling_window_events",
    "graph_2hop_neighbor_agg",
    "semi_anti",
    "text_tokenize_tf",
    "vector_knn_cosine",
    "dedup_exact",
    "sessionize_approx",
)


def _materialize(df) -> None:
    # noop sink executes the full physical plan on executors and discards
    # rows — the closest Spark analogue of DuckDB's "run query, fetch all".
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(sf_name.removeprefix("sf"))
    except ValueError:
        sf = sf_name
    spark = get_spark("bench")

    queries = registry.all_queries()
    # Warmup: full flagship plan (scans+joins+agg) primes codegen & file
    # listing without touching the timed set's fairness.
    _materialize(queries["join_multiway_star"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        _materialize(queries[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 4)

    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
