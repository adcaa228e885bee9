"""Strongly connected components over the DIRECTED vertex-fixture graph
(SURVEY.md §2B graph ops) — the directed twin of
``graph_connected_components``: v and u share an SCC iff they are
MUTUALLY reachable, so the undirected hash-min labels (which merge
one-way-connected vertices) are wrong for directed semantics.

Algorithm here: path-doubling reachability closure — R ← R ∪ (R ∘ R)
squares the reachable path length each round, so FIXED ``DOUBLING_ROUNDS``
= 5 covers 32 hops (≫ the fixture diameter) with a static job graph and
no driver-side convergence read. SCC label(v) = min id over the mutual
set {v} ∪ {u : (v,u) ∈ R ∧ (u,v) ∈ R} — one self-join of the closure on
swapped keys + one min aggregate.

Honest scale boundary: materializing the closure is O(|V|·reach) — exact
and cheap in the 500-id embedding-vertex space (≤ 250k pairs), and
exactly what makes the recursive-CTE oracle viable, but NOT the 100 TB
path. At scale the standard algorithm is forward-backward coloring
(Orzan / FB-trim): iterated forward-min + backward-min label passes —
the same join+agg round shape as ``graph/components.py``, ~|V| state per
round instead of the closure. The plan-shape lesson (per-round
localCheckpoint against the 2^rounds re-analysis blowup) carries over
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import EDGES_V_CTE, derive_vertex_embeddings

DOUBLING_ROUNDS = 5  # 2^5 = 32-hop closure, far beyond the fixture diameter


def scc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        derive_vertex_embeddings(spark, sf_dir)
        .distinct()
        .select(F.col("src_v").alias("v"), F.col("dst_v").alias("u"))
        .filter(F.col("v") != F.col("u"))
        .localCheckpoint()
    )
    reach = e
    n_prev = reach.count()
    for _ in range(DOUBLING_ROUNDS):
        hop = (
            reach.alias("r1")
            .join(
                reach.alias("r2"),
                F.col("r1.u") == F.col("r2.v"),
            )
            .select(F.col("r1.v").alias("v"), F.col("r2.u").alias("u"))
        )
        # reach referenced twice per round (identity + composition):
        # checkpoint keeps Catalyst analysis O(1) per round
        reach = reach.union(hop).distinct().localCheckpoint()
        # O(1) driver convergence read (components.py discipline): the
        # post-fixpoint doubling rounds are the most expensive joins of
        # all, so stopping on a stable pair count saves the worst work
        n_now = reach.count()
        if n_now == n_prev:
            break
        n_prev = n_now
    mutual = (
        reach.alias("f")
        .join(
            reach.alias("b"),
            (F.col("b.v") == F.col("f.u")) & (F.col("b.u") == F.col("f.v")),
        )
        .select(F.col("f.v").alias("v"), F.col("f.u").alias("m"))
    )
    verts = e.select("v").union(e.select(F.col("u").alias("v"))).distinct()
    return (
        verts.join(mutual, "v", "left")
        .groupBy("v")
        .agg(F.least(F.min("m"), F.min("v")).alias("scc"))
        .select("v", F.coalesce("scc", F.col("v")).alias("scc"))
    )


def graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SCC summary: label = min vertex id in the component, size."""
    labels = scc_labels(spark, sf_dir)
    return labels.groupBy(F.col("scc").cast("long").alias("scc")).agg(
        F.count("*").cast("long").alias("n_vertices")
    )


QUERIES = {"graph_scc": graph_scc}

ORACLE = {
    "graph_scc": f"""
        WITH RECURSIVE {EDGES_V_CTE},
        e AS (SELECT DISTINCT src_v AS v, dst_v AS u FROM edges_v
              WHERE src_v <> dst_v),
        reach(v, u) AS (
            SELECT v, u FROM e
            UNION
            SELECT r.v, e.u FROM reach r JOIN e ON e.v = r.u
        ),
        mutual AS (
            SELECT f.v, f.u AS m
            FROM reach f JOIN reach b ON b.v = f.u AND b.u = f.v
        ),
        verts AS (SELECT v FROM e UNION SELECT u AS v FROM e),
        lab AS (
            SELECT verts.v,
                   COALESCE(least(min(mutual.m), verts.v), verts.v) AS scc
            FROM verts LEFT JOIN mutual ON mutual.v = verts.v
            GROUP BY verts.v
        )
        SELECT CAST(scc AS BIGINT) AS scc,
               CAST(count(*) AS BIGINT) AS n_vertices
        FROM lab GROUP BY scc
    """,
}
