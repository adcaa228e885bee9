"""Ground-truth tests for the round-2e additions: closeness centrality vs
a driver-side BFS brute force, the covariance matrix vs numpy.cov moments,
and CUBE cell accounting vs independent group-by passes.
"""

from __future__ import annotations

from collections import deque

import numpy as np
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.closeness import (
    MAX_HOPS,
    SEED_MOD,
    _undirected,
    graph_closeness_centrality,
)
from flink_streaming_gnn_spark.operators.olap import agg_cube
from flink_streaming_gnn_spark.llm.embprep import emb_pca_covariance
from flink_streaming_gnn_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_closeness_matches_bfs_brute_force(spark):
    adj: dict[int, set[int]] = {}
    for r in _undirected(spark, SF_SMOKE).collect():
        adj.setdefault(int(r.a), set()).add(int(r.b))
    seeds = [v for v in adj if v % SEED_MOD == 0]
    assert seeds, "fixture must contain at least one landmark seed"
    out = {int(r.s): r for r in graph_closeness_centrality(spark, SF_SMOKE).collect()}
    assert set(out) == set(seeds)
    for s in seeds:
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] == MAX_HOPS:
                continue
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        reached = {v: d for v, d in dist.items() if d > 0}
        row = out[s]
        assert row.n_reached == len(reached)
        assert row.sum_dist == sum(reached.values())
        assert abs(row.closeness - len(reached) / sum(reached.values())) < 1e-6
        assert abs(row.harmonic - sum(1.0 / d for d in reached.values())) < 1e-6


def test_covariance_matches_numpy(spark):
    x = np.array(
        [
            r.embedding
            for r in load_table(spark, SF_SMOKE, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    # population covariance (divide by N), matching the operator's sp/n form
    expect = np.cov(x, rowvar=False, bias=True)
    got = {(int(r.i), int(r.j)): r.cov for r in emb_pca_covariance(spark, SF_SMOKE).collect()}
    d = x.shape[1]
    assert len(got) == d * (d + 1) // 2  # upper triangle incl. diagonal
    for (i, j), v in got.items():
        assert j >= i
        assert abs(v - expect[i, j]) < 1e-5
    # diagonal entries are variances — strictly positive on this fixture
    assert all(got[(i, i)] > 0 for i in range(d))


def test_cube_cells_match_independent_groupbys(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    cube = agg_cube(spark, SF_SMOKE).collect()
    by_gid: dict[int, list] = {}
    for r in cube:
        by_gid.setdefault(int(r.gid), []).append(r)
    # gid bit vector: bit set = column aggregated away (MSB = first col)
    assert set(by_gid) == {0, 1, 2, 3}
    grand = by_gid[3]
    assert len(grand) == 1
    assert grand[0].n == o.count()
    # gid=0: plain group-by on both columns
    plain = {
        (r.o_orderstatus, r.o_orderpriority): r.n
        for r in o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {
        (r.o_orderstatus, r.o_orderpriority): r.n for r in by_gid[0]
    }
    assert got == plain
    # every marginal's counts sum to the grand total
    for gid in (0, 1, 2):
        assert sum(r.n for r in by_gid[gid]) == grand[0].n
