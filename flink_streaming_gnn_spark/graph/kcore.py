"""k-core extraction on the supplier co-order projection (SURVEY.md §2B
graph ops; the standard density filter a graph pipeline runs before
expensive per-vertex work — the reference's A10 iteration head/tail is the
dataflow shape this driver loop re-expresses).

Algorithm: iterative peeling — drop every vertex with degree < K, re-derive
degrees on the induced subgraph, repeat to fixpoint. Each round is one
hash aggregate (degrees) + two semi-joins (filter endpoints), all shuffling
on the same vertex key so consecutive rounds reuse the partitioning. The
fixpoint read is O(1) (a count), like components.py; rounds are bounded by
the peeling depth, which is ≤ the degeneracy of the graph — small on
real-world graphs.

Rows-only key (iterative fixpoint is not single-statement SQL without a
recursive CTE that DuckDB would evaluate quadratically on the dense
projection); exact equality vs a sequential peeling reference is pinned in
tests/test_new_ops.py at smoke scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.triangles import _supplier_edges

K = 5
MAX_ROUNDS = 30


def kcore_vertices(spark: SparkSession, sf_dir: str, k: int = K) -> DataFrame:
    """Vertices of the k-core with their degree inside the core."""
    # undirected: materialize both directions once, peel on (v, other)
    e = _supplier_edges(spark, sf_dir)
    und = (
        e.select(F.col("a").alias("v"), F.col("b").alias("o"))
        .union(e.select(F.col("b").alias("v"), F.col("a").alias("o")))
        .persist()
    )
    n_prev = und.count()
    try:
        cur = und
        for _ in range(MAX_ROUNDS):
            keep = (
                cur.groupBy("v")
                .agg(F.count("*").alias("deg"))
                .filter(F.col("deg") >= k)
                .select("v")
            )
            nxt = (
                cur.join(keep, "v", "left_semi")
                .join(keep.select(F.col("v").alias("o")), "o", "left_semi")
                .persist()
            )
            n_cur = nxt.count()  # O(1) fixpoint read, materializes the round
            if cur is not und:
                cur.unpersist()
            cur = nxt
            if n_cur == n_prev:
                break
            n_prev = n_cur
        out = cur.groupBy("v").agg(F.count("*").cast("long").alias("core_deg"))
        rows = out.collect()  # |core| rows — summary-sized
        if cur is not und:
            cur.unpersist()
        return spark.createDataFrame(rows, schema="v long, core_deg long")
    finally:
        und.unpersist()


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kcore_vertices(spark, sf_dir).orderBy("v")


QUERIES = {"graph_kcore": graph_kcore}
ORACLE: dict[str, str] = {}  # rows-only: see module docstring
