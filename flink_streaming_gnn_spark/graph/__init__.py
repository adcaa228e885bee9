"""Graph layer — the reference system's core surface, relationalized.

The reference is a streaming GNN on Flink (/root/reference/README.md:1-2):
a partitioned graph store + incremental neighbor aggregators + NN forward
plugins (SURVEY.md §2A A5-A9). The structural insight (SURVEY.md §2A):
GNN message-passing IS ``edges ⋈ vertices → groupBy(dst) → agg →
vectorized map``. This package expresses exactly that with DataFrame ops
and one Arrow-batched numpy UDF for the tensor math.
"""
