"""Semantic ground-truth tests for the round-2 operator additions, beyond
the oracle parity every registered key already gets in
test_oracle_differential.py: brute-force / numpy references at smoke scale.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd

from flink_streaming_gnn_spark.graph.attention import (
    DIM,
    LEAK,
    OUT_DIMS,
    gat_weights,
    graph_gat_layer,
)
from flink_streaming_gnn_spark.graph.edges import derive_edges, derive_vertex_embeddings
from flink_streaming_gnn_spark.graph.sampling import (
    FANOUT,
    graph_neighbor_sample,
    graph_negative_sample,
)
from flink_streaming_gnn_spark.graph.triangles import graph_triangle_count
from flink_streaming_gnn_spark.operators.timeseries import cdc_latest_snapshot
from flink_streaming_gnn_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_neighbor_sample_is_bounded_subset(spark):
    edges = {
        (int(r.src), int(r.dst))
        for r in derive_edges(spark, SF_SMOKE).select("src", "dst").distinct().collect()
    }
    sample = graph_neighbor_sample(spark, SF_SMOKE).toPandas()
    # subset of the real edge set
    for r in sample.itertuples():
        assert (int(r.neighbor), int(r.vertex)) in edges
    # fanout bound and dense ranks per vertex
    by_v = sample.groupby("vertex")
    assert (by_v.size() <= FANOUT).all()
    for _, grp in by_v:
        assert sorted(grp.sample_rank) == list(range(1, len(grp) + 1))
    # vertices with >= FANOUT in-neighbors keep exactly FANOUT
    from collections import Counter

    indeg = Counter(d for _, d in edges)
    for v, grp in by_v:
        assert len(grp) == min(FANOUT, indeg[v])


def test_negative_sample_disjoint_from_edges(spark):
    edges = {
        (int(r.src), int(r.dst))
        for r in derive_edges(spark, SF_SMOKE).select("src", "dst").distinct().collect()
    }
    s_cnt = load_table(spark, SF_SMOKE, "supplier").count()
    neg = graph_negative_sample(spark, SF_SMOKE).toPandas()
    assert len(neg) > 0
    for r in neg.itertuples():
        assert (int(r.src), int(r.neg_dst)) not in edges
        assert 1 <= int(r.neg_dst) <= s_cnt


def test_gat_layer_matches_numpy(spark):
    a_src, a_dst = gat_weights()
    edges = (
        derive_vertex_embeddings(spark, SF_SMOKE)
        .distinct()
        .toPandas()
        .astype(int)
    )
    emb = load_table(spark, SF_SMOKE, "embeddings").toPandas()
    feats = {
        int(r.vec_id): np.asarray(list(r.embedding), dtype=np.float64)
        for r in emb.itertuples()
    }
    # numpy reference: additive attention + softmax per dst
    by_dst: dict[int, list[int]] = {}
    for r in edges.itertuples():
        by_dst.setdefault(int(r.dst_v), []).append(int(r.src_v))
    expected = {}
    for dst, srcs in by_dst.items():
        raw = np.array(
            [feats[s] @ a_src + feats[dst] @ a_dst for s in srcs]
        )
        score = np.where(raw > 0, raw, LEAK * raw)
        ex = np.exp(score - score.max())
        alpha = ex / ex.sum()
        h = (alpha[:, None] * np.stack([feats[s] for s in srcs])).sum(axis=0)
        expected[dst] = h[:OUT_DIMS]
    got = graph_gat_layer(spark, SF_SMOKE).toPandas()
    assert len(got) == len(expected)
    for r in got.itertuples():
        want = expected[int(r.vec_id)]
        have = np.array([getattr(r, f"h{i}") for i in range(1, OUT_DIMS + 1)])
        np.testing.assert_allclose(have, np.round(want, 4), atol=2e-4)


def test_triangle_count_matches_bruteforce(spark):
    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .toPandas()
    )
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        for a, b in combinations(sorted(set(grp.l_suppkey)), 2):
            edges.add((int(a), int(b)))
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    n_tri = sum(
        1
        for a, b in edges
        for c in adj.get(b, ())
        if c in adj.get(a, ())
    )
    row = graph_triangle_count(spark, SF_SMOKE).collect()[0]
    assert row.n_edges == len(edges)
    assert row.n_triangles == n_tri


def test_kcore_matches_sequential_peel(spark):
    from flink_streaming_gnn_spark.graph.kcore import K, kcore_vertices
    from flink_streaming_gnn_spark.graph.triangles import _supplier_edges

    pairs = {
        (int(r.a), int(r.b)) for r in _supplier_edges(spark, SF_SMOKE).collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # sequential peel
    changed = True
    while changed:
        drop = [v for v, ns in adj.items() if len(ns) < K]
        changed = bool(drop)
        for v in drop:
            for o in adj.pop(v):
                adj[o].discard(v)
    got = {int(r.v): int(r.core_deg) for r in kcore_vertices(spark, SF_SMOKE).collect()}
    want = {v: len(ns) for v, ns in adj.items() if ns}
    assert got == want


def test_common_neighbors_matches_bruteforce(spark):
    from flink_streaming_gnn_spark.graph.linkpred import graph_common_neighbors

    edges = {
        (int(r.src), int(r.dst))
        for r in derive_edges(spark, SF_SMOKE).select("src", "dst").distinct().collect()
    }
    nbrs: dict[int, set[int]] = {}
    for c, s in edges:
        nbrs.setdefault(s, set()).add(c)
    got = graph_common_neighbors(spark, SF_SMOKE).toPandas()
    for r in got.itertuples():
        a, b = int(r.a), int(r.b)
        common = len(nbrs[a] & nbrs[b])
        assert int(r.common) == common
        assert int(r.deg_a) == len(nbrs[a])
        assert int(r.deg_b) == len(nbrs[b])
        assert abs(r.jaccard - round(common / len(nbrs[a] | nbrs[b]), 6)) < 1e-9


def test_cdc_snapshot_matches_pandas(spark):
    ev = load_table(spark, SF_SMOKE, "events").toPandas()
    last = (
        ev.sort_values(["user_id", "ts", "event_id"])
        .groupby("user_id")
        .tail(1)
    )
    want = last[last.event_type != "error"]
    got = cdc_latest_snapshot(spark, SF_SMOKE).toPandas()
    assert len(got) == len(want)
    merged = got.merge(
        want[["user_id", "event_type", "value"]], on="user_id", how="inner"
    )
    assert len(merged) == len(want)
    assert (merged.last_type == merged.event_type).all()
    assert np.allclose(merged.last_value, merged.value)
