"""Graph layer — the reference system's core surface, relationalized.

The reference is a streaming GNN on Flink (/root/reference/README.md:1-2):
a partitioned graph store + incremental neighbor aggregators + NN forward
plugins (SURVEY.md §2A A5-A9). The structural insight (SURVEY.md §2A):
GNN message-passing IS ``edges ⋈ vertices → groupBy(dst) → agg →
vectorized map``. This package expresses exactly that with DataFrame ops
and one Arrow-batched numpy UDF for the tensor math.

Modules: ``edges`` (fixture edge derivation), ``ops`` (degree / 1-hop /
pre-aggregated 2-hop / hash partition assignment), the GNN layer zoo —
``sage`` (mean-agg + Arrow numpy forward), ``attention`` (GAT), ``gcn``
(symmetric-normalized, all-JVM), ``gin`` (sum-agg + literal MLP, all-JVM)
— ``graphop`` (the GraphOp mutation-log data model with last-writer-wins
materialization), ``hdrf`` (faithful HDRF streaming vertex-cut, A4),
``train`` (A3 splitter + A13 readout + A10/A14 driver-loop training),
``sampling`` (fixed-fanout neighbor + negative sampling), ``ego`` (2-hop
receptive-field extraction), ``walks`` (deterministic random walks),
``temporal`` (snapshot degrees + time-decayed aggregation), the iterative
family — ``components``, ``pagerank``, ``bfs``, ``lpa``, ``hits``,
``katz``, ``kcore`` — and the structural statistics: ``triangles``,
``linkpred`` (common-neighbors / Adamic-Adar), ``assortativity``.
"""
