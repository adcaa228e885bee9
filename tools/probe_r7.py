#!/usr/bin/env python
"""Round-7 ×10 probe (VERDICT r6 "Next round" #3 + watch items): quiet-box
re-measurement of (a) `text_ngram_novelty` — three fresh-JVM runs to pin
the 40.1/56.9 s variance, (b) the keys round 7 touched —
`stream_scd2_e2e` (state-store opens readout replacing the batch events
re-scan), `dedup_embedding_cosine` (kernel extracted + residency guard),
`graph_triangle_count` / `graph_clustering_coefficient` (slab-blocked
masked-A², peak memory 3 GiB → ~1.3 GiB at the dense bound).

Usage: python tools/probe_r7.py [key ...]   (one JVM per invocation;
loop externally for fresh-JVM repeats)."""

from __future__ import annotations

import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_streaming_gnn_spark import registry  # noqa: E402
from flink_streaming_gnn_spark.session import get_spark  # noqa: E402

# published blown-corpus dirs are graft_blown_<12-hex>; bench.py's
# mkdtemp staging dirs carry an extra random suffix and may be
# incomplete (crashed run) — never probe against those
_PUBLISHED = re.compile(r"graft_blown_[0-9a-f]{12}$")

KEYS = (
    "text_ngram_novelty",
    "stream_scd2_e2e",
    "dedup_embedding_cosine",
    "graph_triangle_count",
    "graph_clustering_coefficient",
)


def main() -> None:
    dirs = sorted(
        d for d in glob.glob("/tmp/graft_blown_*") if _PUBLISHED.search(d)
    )
    if not dirs:
        raise SystemExit("no published blown corpus cache; run bench.py first")
    blown = dirs[0]
    spark = get_spark("probe_r7")
    queries = registry.all_queries()
    keys = sys.argv[1:] or KEYS
    for key in keys:
        t0 = time.perf_counter()
        try:
            queries[key](spark, blown).write.format("noop").mode("overwrite").save()
            print(f"{key}: {time.perf_counter() - t0:.1f}s", flush=True)
        except Exception as exc:  # noqa: BLE001 — probe records, not raises
            print(f"{key}: ERROR {str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
