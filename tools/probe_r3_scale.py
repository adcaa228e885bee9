#!/usr/bin/env python
"""One-off scale probe: run every round-3 registry key against the
10×-replicated ≈sf1 corpus (the bench.py sf1x10 cache) and print wall
times — the same evidence the earlier round recorded for its keys in
README "Scale probe" notes. Spark-only timings (no DuckDB compare: the
oracle side is exercised at sf0.01 by the driver; this probe is about
whether each plan's shape survives 10× the bench scale)."""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_streaming_gnn_spark import registry  # noqa: E402
from flink_streaming_gnn_spark.session import get_spark  # noqa: E402

R3_KEYS = (
    "tokenizer_bpe_train",
    "graph_betweenness_landmark",
    "ts_cusum_changepoint",
    "fn_variant_json",
    "agg_count_min_sketch",
    "join_bloom_prefilter",
    "graph_eigenvector_centrality",
    "text_quality_gopher",
    "ts_anomaly_mad",
    "graph_mst_boruvka",
    "profile_column_entropy",
    "emb_whitening",
    "graph_ktruss",
    "ts_periodogram",
    "agg_decimal_exact",
    "text_bigram_pmi",
    "ml_kmeans_lloyd",
    "agg_higher_moments",
    "stream_dedup_e2e",
)


def main() -> None:
    dirs = sorted(glob.glob("/tmp/graft_blown_*"))
    if not dirs:
        raise SystemExit("no blown corpus cache; run bench.py first")
    blown = dirs[0]
    spark = get_spark("probe_r3")
    queries = registry.all_queries()
    for key in R3_KEYS:
        t0 = time.perf_counter()
        try:
            queries[key](spark, blown).write.format("noop").mode("overwrite").save()
            print(f"{key}: {time.perf_counter() - t0:.1f}s", flush=True)
        except Exception as exc:
            print(f"{key}: ERROR {str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
