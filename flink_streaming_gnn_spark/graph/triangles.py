"""Triangle counting on the supplier co-order projection (SURVEY.md §2B
graph ops; the bipartite purchase graph has no odd cycles, so the classic
triangle statistic lives on its one-mode projection: suppliers are adjacent
when they ship lineitems of the same order).

Spark-first shape: the standard two-join ordered enumeration —

    edges oriented a < b; triangles = E(a,b) ⋈ E(b,c) ⋈ E(a,c)

entirely as equi-joins Catalyst plans as shuffled hash joins on the vertex
keys. Ordering every edge (a < b) means each triangle is produced exactly
once and the wedge join only extends ascending paths, halving the
intermediate.

Scale posture: the textbook refinement at 100 TB is degree-based
orientation (point each edge at its higher-degree endpoint) which bounds
per-vertex wedge fan-out by the graph arboricity instead of max degree —
one extra degree join, same plan shape. The projection itself
(lineitem ⋈ lineitem on orderkey) is bounded by per-order line counts
(≤7 in TPC-H-like data), so it scales linearly in orders; it would be the
first thing to bucket by orderkey on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table


def _supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected co-order supplier pairs, oriented a < b."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    return (
        li.join(l2, (li.l_orderkey == l2.o2) & (li.l_suppkey < l2.s2))
        .select(F.col("l_suppkey").alias("a"), F.col("s2").alias("b"))
        .distinct()
    )


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row graph summary: projected edge count + triangle count."""
    e = _supplier_edges(spark, sf_dir).persist()
    e1 = e
    e2 = e.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    e3 = e.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    wedges = e1.join(e2, e1.b == e2.b2)  # a < b < c ascending paths
    tris = wedges.join(e3, (wedges.a == e3.a3) & (wedges.c == e3.c3))
    out = e.agg(F.count("*").cast("long").alias("n_edges")).crossJoin(
        tris.agg(F.count("*").cast("long").alias("n_triangles"))
    )
    rows = out.collect()  # 1-row summary; release the edge cache
    e.unpersist()
    return spark.createDataFrame(rows, schema="n_edges long, n_triangles long")


QUERIES = {"graph_triangle_count": graph_triangle_count}

ORACLE = {
    "graph_triangle_count": """
        WITH pairs AS (
            SELECT DISTINCT l1.l_suppkey AS a, l2.l_suppkey AS b
            FROM lineitem l1
            JOIN lineitem l2
              ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
               (SELECT CAST(count(*) AS BIGINT)
                FROM pairs e1
                JOIN pairs e2 ON e1.b = e2.a
                JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
    """,
}
