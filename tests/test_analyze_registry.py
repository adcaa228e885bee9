"""Construct + analyze EVERY registry key (ADVICE r9 #4: the
ambiguous-self-join tripwire tools/analyze_all_keys.py ran only by hand;
as a pytest it runs on every test pass).

The class this guards: load_table's resolved-DataFrame memo makes repeat
loads of a table share ONE relation instance, so any future key that
joins two load_table results of the same table without .alias() hits an
ambiguous-self-join ANALYSIS error deterministically — forcing .schema
on every constructed key catches it in one pass, no execution beyond
what construction itself does (streaming e2e keys do run their drains
at construction; SF_SMOKE keeps that bounded).
"""

from __future__ import annotations

from flink_streaming_gnn_spark import registry
from tests.conftest import SF_SMOKE


def test_every_registry_key_analyzes(spark):
    queries = registry.all_queries()
    failed = []
    for name in sorted(queries):
        try:
            df = queries[name](spark, SF_SMOKE)
            _ = df.schema  # forces analysis
        except Exception as exc:  # noqa: BLE001 — collect all failures
            failed.append(f"{name}: {type(exc).__name__}: {str(exc)[:160]}")
    assert not failed, "analysis failures:\n" + "\n".join(failed)
