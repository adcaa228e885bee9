"""Round-5b additions: last-touch attribution and Theil–Sen robust
trend — each pinned against a from-scratch Python twin on the smoke
fixture (the oracle differential covers the DuckDB twin separately)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE  # noqa: F401


# ---------------------------------------------------------------------------
# operators/behavior.py — last-touch attribution vs a sequential Python
# replay of each user's event history.


def test_attribution_last_touch_vs_python(spark):
    from collections import defaultdict

    from flink_streaming_gnn_spark.operators.behavior import (
        olap_attribution_last_touch,
    )
    from flink_streaming_gnn_spark.sources.tables import load_table

    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    want_n: dict[str, int] = defaultdict(int)
    want_v: dict[str, float] = defaultdict(float)
    for hist in by_user.values():
        hist.sort(key=lambda r: (r.ts, r.event_id))
        channel = None
        for r in hist:
            if r.event_type == "purchase":
                c = channel if channel is not None else "direct"
                want_n[c] += 1
                want_v[c] += r.value
            else:
                channel = r.event_type
    got = {
        r.channel: r
        for r in olap_attribution_last_touch(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want_n)
    for c in want_n:
        assert got[c].n_purchases == want_n[c]
        assert abs(got[c].attributed_value - round(want_v[c], 2)) < 1e-6


# ---------------------------------------------------------------------------
# operators/robust.py — Theil–Sen slope vs a from-scratch Python
# daily-mean + all-pairs-median computation.


def test_theil_sen_vs_python(spark):
    from collections import defaultdict
    from statistics import median

    from flink_streaming_gnn_spark.operators.robust import (
        ts_theil_sen_trend,
    )
    from flink_streaming_gnn_spark.sources.tables import load_table

    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_type", "ts", "value")
        .collect()
    )
    sums = defaultdict(lambda: [0.0, 0])
    for r in rows:
        k = (r.event_type, r.ts.date())
        sums[k][0] += r.value
        sums[k][1] += 1
    daily = defaultdict(list)
    for (et, day), (s, n) in sums.items():
        daily[et].append((day, s / n))
    want: dict[str, tuple[int, float]] = {}
    for et, pts in daily.items():
        pts.sort()
        slopes = [
            (v2 - v1) / (d2 - d1).days
            for i, (d1, v1) in enumerate(pts)
            for (d2, v2) in pts[i + 1 :]
        ]
        want[et] = (len(slopes), median(slopes))
    got = {r.event_type: r for r in ts_theil_sen_trend(spark, SF_SMOKE).collect()}
    assert set(got) == set(want)
    for et, (n_pairs, slope) in want.items():
        assert got[et].n_pairs == n_pairs
        assert abs(got[et].theil_sen_slope - round(slope, 6)) < 1e-6


# ---------------------------------------------------------------------------
# streaming/graphcc.py — the incremental merge step must equal a Python
# union-find over the CUMULATIVE edge set after EVERY batch, on a
# synthetic sequence engineered so components merge ACROSS batch
# boundaries (the case the single-component sf fixture can't probe).


def test_incremental_cc_merges_across_batches(spark):
    from flink_streaming_gnn_spark.streaming.graphcc import merge_batch

    batches = [
        [(0, 1), (2, 3), (4, 5), (10, 11)],   # four islands
        [(1, 2), (5, 6)],                      # chain two pairs of them
        [(3, 4), (20, 21)],                    # merge everything 0..6 + new island
    ]

    def uf_components(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {v: find(v) for v in parent}

    labels = None
    seen: list[tuple[int, int]] = []
    for batch in batches:
        seen += batch
        und = spark.createDataFrame(
            [(a, b) for a, b in batch] + [(b, a) for a, b in batch],
            "a long, b long",
        )
        labels = merge_batch(labels, und).localCheckpoint()
        got = {r["v"]: r["lbl"] for r in labels.collect()}
        assert got == uf_components(seen), f"diverged after batch {batch}"


# ---------------------------------------------------------------------------
# registry integrity for the new keys.


def test_round5b_keys_registered():
    from flink_streaming_gnn_spark import registry

    q = registry.all_queries()
    o = registry.all_oracle_sql()
    for k in (
        "olap_attribution_last_touch",
        "ts_theil_sen_trend",
        "stream_cc_e2e",
    ):
        assert k in q and k in o
