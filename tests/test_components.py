"""Connected components: the Spark hash-min propagation must match a
plain union-find ground truth exactly (labels are deterministic: min
vertex id per component)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.components import (
    cc_labels,
    graph_connected_components,
)
from flink_streaming_gnn_spark.graph.edges import derive_edges
from tests.conftest import SF_SMOKE


class _UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def _ground_truth(spark):
    edges = derive_edges(spark, SF_SMOKE).select("src", "dst").distinct().toPandas()
    uf = _UnionFind()
    for r in edges.itertuples():
        uf.union(int(r.src) * 2, int(r.dst) * 2 + 1)
    labels = {}
    for v in list(uf.parent):
        root = uf.find(v)
        labels[v] = root
    # min vertex id per component == union-find root relabeled to min member
    comp_min: dict[int, int] = {}
    for v, root in labels.items():
        comp_min[root] = min(comp_min.get(root, v), v)
    return {v: comp_min[root] for v, root in labels.items()}


def test_cc_labels_match_union_find(spark):
    truth = _ground_truth(spark)
    got = {int(r["v"]): int(r["lbl"]) for r in cc_labels(spark, SF_SMOKE).collect()}
    assert got == truth


def test_cc_summary_consistent(spark):
    truth = _ground_truth(spark)
    summary = graph_connected_components(spark, SF_SMOKE).toPandas()
    assert summary["n_vertices"].sum() == len(truth)
    # one row per distinct component, labeled by its min vertex
    comps = {}
    for v, lbl in truth.items():
        comps.setdefault(lbl, []).append(v)
    assert sorted(summary["component"]) == sorted(comps)
    for row in summary.itertuples():
        members = comps[int(row.component)]
        assert row.n_vertices == len(members)
        assert row.n_customers == sum(1 for m in members if m % 2 == 0)
        assert row.n_suppliers == sum(1 for m in members if m % 2 == 1)
