#!/usr/bin/env python
"""Construct + analyze EVERY registry key (no execution beyond what query
construction itself does) — a fast tripwire for analysis-time regressions
such as ambiguous-self-join errors introduced by plan/relation sharing
(round-9 E5: load_table's resolved-DataFrame memo makes repeat loads share
leaf relations, so any key relying on distinct relation instances for a
self-join would now fail at ANALYSIS time, deterministically — this probe
catches that class in minutes instead of a full differential).

Usage: python tools/analyze_all_keys.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_streaming_gnn_spark import registry  # noqa: E402
from flink_streaming_gnn_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("analyze_all_keys")
    queries = registry.all_queries()
    failed = []
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            _ = df.schema  # forces analysis
            status = f"ok ({len(df.columns)} cols)"
        except Exception as exc:  # noqa: BLE001 — report and continue
            failed.append(name)
            status = f"FAIL: {type(exc).__name__}: {str(exc)[:200]}"
            traceback.print_exc(limit=3, file=sys.stderr)
        print(f"{name}: {status} [{time.perf_counter() - t0:.1f}s]", flush=True)
    print(
        f"RESULT: {len(queries) - len(failed)} analyzed ok, "
        f"{len(failed)} FAIL of {len(queries)}"
        + (f" — {failed}" if failed else "")
    )
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
