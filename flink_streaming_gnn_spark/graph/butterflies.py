"""Butterfly (bipartite 4-cycle) counting — the bipartite analogue of
triangle counting (Sariyüce & Pinar, "Peeling Bipartite Networks for
Dense Subgraph Discovery", WSDM 2018; Sanei-Mehri et al., KDD 2018).
The purchase graph is bipartite (customers × suppliers), so triangles
cannot exist natively; the butterfly — two customers sharing two
suppliers, the 2×2 biclique — is its smallest cohesion motif, and the
global/per-vertex butterfly counts are the bipartite clustering
coefficients' backbone.

Counting identity (the standard wedge formulation): for every supplier
pair (a < b) with ``m`` shared customers, the pair closes C(m, 2)
butterflies, so

    total = Σ_pairs m·(m−1)/2,

and each of the pair's shared customers participates in (m−1) of them.
The wedge join e1(c, a) ⋈ e2(c, b) is the exact fan-out every published
butterfly counter pays (Σ_c deg(c)² wedges); at 100 TB the standard
refinements are per-customer degree caps and counting from the rarer
side first — both one filter/swap on this plan, same as
``graph/linkpred.py``'s wedge discipline.

Output: one summary row (n_wedges, n_pairs, n_butterflies) plus the
top suppliers by butterfly participation — bounded, deterministic
ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import EDGES_CTE, derive_edges


def graph_butterfly_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global butterfly census of the bipartite purchase graph: wedge
    join on the shared customer → per-supplier-pair common count m →
    Σ C(m, 2). One equi-join + two hash aggregates, no motif
    enumeration — butterflies are never materialized, only counted."""
    e = derive_edges(spark, sf_dir).select("src", "dst").distinct()
    e2 = e.select(F.col("src").alias("src2"), F.col("dst").alias("b"))
    pairs = (
        e.join(e2, (e.src == e2.src2) & (e.dst < e2.b))
        .groupBy(F.col("dst").alias("a"), "b")
        .agg(F.count("*").cast("long").alias("m"))
    )
    return pairs.agg(
        F.sum("m").cast("long").alias("n_wedges"),
        F.count("*").cast("long").alias("n_pairs"),
        (F.sum(F.col("m") * (F.col("m") - 1)) / 2)
        .cast("long")
        .alias("n_butterflies"),
    )


def graph_butterfly_per_vertex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier butterfly participation: supplier v closes
    Σ_{pairs containing v} C(m, 2) butterflies. Top 100 by count with
    deterministic tie-break — the peeling order seed of bipartite
    densest-subgraph algorithms."""
    e = derive_edges(spark, sf_dir).select("src", "dst").distinct()
    e2 = e.select(F.col("src").alias("src2"), F.col("dst").alias("b"))
    pairs = (
        e.join(e2, (e.src == e2.src2) & (e.dst < e2.b))
        .groupBy(F.col("dst").alias("a"), "b")
        .agg(F.count("*").cast("long").alias("m"))
        .withColumn("bfly", (F.col("m") * (F.col("m") - 1) / 2).cast("long"))
    )
    per_v = (
        pairs.select(F.col("a").alias("v"), "bfly")
        .union(pairs.select(F.col("b").alias("v"), "bfly"))
        .groupBy("v")
        .agg(F.sum("bfly").cast("long").alias("n_butterflies"))
    )
    return per_v.orderBy(F.col("n_butterflies").desc(), "v").limit(100)


QUERIES = {
    "graph_butterfly_count": graph_butterfly_count,
    "graph_butterfly_per_vertex": graph_butterfly_per_vertex,
}

ORACLE = {
    "graph_butterfly_count": f"""
        WITH {EDGES_CTE},
        de AS (SELECT DISTINCT src, dst FROM edges),
        pairs AS (
            SELECT e1.dst AS a, e2.dst AS b, CAST(count(*) AS BIGINT) AS m
            FROM de e1 JOIN de e2 ON e1.src = e2.src AND e1.dst < e2.dst
            GROUP BY e1.dst, e2.dst
        )
        SELECT CAST(sum(m) AS BIGINT) AS n_wedges,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(m * (m - 1)) / 2 AS BIGINT) AS n_butterflies
        FROM pairs
    """,
    "graph_butterfly_per_vertex": f"""
        WITH {EDGES_CTE},
        de AS (SELECT DISTINCT src, dst FROM edges),
        pairs AS (
            SELECT e1.dst AS a, e2.dst AS b, CAST(count(*) AS BIGINT) AS m
            FROM de e1 JOIN de e2 ON e1.src = e2.src AND e1.dst < e2.dst
            GROUP BY e1.dst, e2.dst
        ),
        sides AS (
            SELECT a AS v, CAST(m * (m - 1) / 2 AS BIGINT) AS bfly FROM pairs
            UNION ALL
            SELECT b AS v, CAST(m * (m - 1) / 2 AS BIGINT) AS bfly FROM pairs
        )
        SELECT v, CAST(sum(bfly) AS BIGINT) AS n_butterflies
        FROM sides
        GROUP BY v
        ORDER BY n_butterflies DESC, v
        LIMIT 100
    """,
}
