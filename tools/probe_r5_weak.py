#!/usr/bin/env python
"""Round-5 weak-set re-measurement at the ×10 bench corpus (VERDICT r4
"Next round" #8): wall time per key, noop sink, fresh JVM — the same
evidence recorded for rounds 3/4 in README. Keys: the three r4 `weak`
keys plus the keys round 5 touched."""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_streaming_gnn_spark import registry  # noqa: E402
from flink_streaming_gnn_spark.session import get_spark  # noqa: E402

KEYS = (
    "user_rfm_segments",
    "graph_mst_boruvka",
    "graph_betweenness_landmark",
    "stream_cep_funnel_e2e",
    "graph_butterfly_count",
    "graph_butterfly_per_vertex",
    "dedup_containment",
    "stream_dedup_ttl_e2e",
    "tokenizer_bpe_encode",
)


def main() -> None:
    dirs = sorted(glob.glob("/tmp/graft_blown_*"))
    if not dirs:
        raise SystemExit("no blown corpus cache; run bench.py first")
    blown = dirs[0]
    spark = get_spark("probe_r5_weak")
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
