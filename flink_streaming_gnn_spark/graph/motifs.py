"""Directed 3-node motif census (SURVEY.md §2B graph ops, next to
``graph_triangle_count`` / ``graph_temporal_wedge``): count the two
canonical connected 3-node directed motifs — the FEED-FORWARD LOOP
(a→b, b→c, a→c: the signal-processing motif overrepresented in real
regulatory/information networks) and the 3-CYCLE (a→b, b→c, c→a) —
Milo et al., "Network Motifs" (Science 2002).

Counting semantics (exact, no double count): over the DISTINCT simple
directed edge set (self-loops dropped),

* an FFL instance is an (a, b, c) role assignment with all three nodes
  distinct — roles (source, middle, sink) make each instance unique;
* a 3-cycle is rotation-invariant, so instances are canonicalized by
  requiring ``a`` to be the smallest vertex (each cycle counted once).

Spark-first shape: the standard wedge closure — E ⋈ E on the shared
middle (fan-out Σ_v deg_in(v)·deg_out(v), the same bound as every
triangle system) then ONE more equi-join against E for the closing
edge, all shuffles on vertex id; output is a single bounded row. At
100 TB the standard refinement is degree-ordered direction choices
(close from the lower-degree side); the fixture graph is dense in a
500-id space so the plain closure is the measured-cheapest plan here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import EDGES_V_CTE, derive_vertex_embeddings


def graph_motif_ffl_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        derive_vertex_embeddings(spark, sf_dir)
        .filter(F.col("src_v") != F.col("dst_v"))
        .distinct()
        .select(F.col("src_v").alias("a"), F.col("dst_v").alias("b"))
        .localCheckpoint()  # referenced three times below
    )
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = e.join(e2, "b").filter(F.col("a") != F.col("c"))
    e3 = e.select(F.col("a").alias("ca"), F.col("b").alias("cb"))
    ffl = wedges.join(
        e3, (F.col("ca") == F.col("a")) & (F.col("cb") == F.col("c"))
    ).agg(F.count("*").cast("long").alias("n"))
    cyc = (
        wedges.join(e3, (F.col("ca") == F.col("c")) & (F.col("cb") == F.col("a")))
        .filter((F.col("a") < F.col("b")) & (F.col("a") < F.col("c")))
        .agg(F.count("*").cast("long").alias("n"))
    )
    n_edges = e.agg(F.count("*").cast("long").alias("n"))
    return (
        n_edges.select(F.col("n").alias("n_edges"))
        .join(ffl.select(F.col("n").alias("n_ffl")))
        .join(cyc.select(F.col("n").alias("n_cycle")))
    )


QUERIES = {"graph_motif_ffl_cycle": graph_motif_ffl_cycle}

ORACLE = {
    "graph_motif_ffl_cycle": f"""
        WITH {EDGES_V_CTE},
        e AS MATERIALIZED (
            SELECT DISTINCT src_v AS a, dst_v AS b
            FROM edges_v WHERE src_v <> dst_v
        )
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
            (SELECT CAST(count(*) AS BIGINT)
             FROM e e1 JOIN e e2 ON e2.a = e1.b
                       JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
             WHERE e1.a <> e2.b) AS n_ffl,
            (SELECT CAST(count(*) AS BIGINT)
             FROM e e1 JOIN e e2 ON e2.a = e1.b
                       JOIN e e3 ON e3.a = e2.b AND e3.b = e1.a
             WHERE e1.a <> e2.b
               AND e1.a < e1.b AND e1.a < e2.b) AS n_cycle
    """,
}


def graph_dyad_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holland–Leinhardt DYAD census of the directed vertex graph:
    mutual (both directions), asymmetric (exactly one), null (neither)
    pair counts — the 2-node floor under the 3-node motif census above,
    and the standard reciprocity summary of a directed network.

    All-integer relational arithmetic: mutual pairs from ONE self-join
    of the deduped edge list on swapped keys (a < b canonicalization),
    asymmetric = distinct undirected pairs − mutual, null = C(n,2) −
    undirected pairs over the observed vertex set. One bounded row out."""
    e = (
        derive_vertex_embeddings(spark, sf_dir)
        .filter(F.col("src_v") != F.col("dst_v"))
        .distinct()
        .select(F.col("src_v").alias("a"), F.col("dst_v").alias("b"))
        .localCheckpoint()  # referenced four times below
    )
    n_vertices = (
        e.select(F.col("a").alias("v"))
        .union(e.select(F.col("b").alias("v")))
        .distinct()
        .count()
    )
    undirected = (
        e.select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        .distinct()
        .count()
    )
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    mutual = e.join(rev, ["a", "b"]).filter(F.col("a") < F.col("b")).count()
    asym = undirected - mutual
    null = n_vertices * (n_vertices - 1) // 2 - undirected
    return spark.createDataFrame(
        [(n_vertices, mutual, asym, null)],
        "n_vertices long, mutual long, asymmetric long, null_dyads long",
    )


QUERIES["graph_dyad_census"] = graph_dyad_census
ORACLE["graph_dyad_census"] = f"""
    WITH {EDGES_V_CTE},
    e AS MATERIALIZED (
        SELECT DISTINCT src_v AS a, dst_v AS b
        FROM edges_v WHERE src_v <> dst_v
    ),
    verts AS (
        SELECT CAST(count(DISTINCT v) AS BIGINT) AS n FROM (
            SELECT a AS v FROM e UNION ALL SELECT b FROM e
        )
    ),
    und AS (
        SELECT CAST(count(*) AS BIGINT) AS u FROM (
            SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi FROM e
        )
    ),
    mut AS (
        SELECT CAST(count(*) AS BIGINT) AS m
        FROM e e1 JOIN e e2 ON e2.a = e1.b AND e2.b = e1.a
        WHERE e1.a < e1.b
    )
    SELECT verts.n AS n_vertices,
           mut.m AS mutual,
           und.u - mut.m AS asymmetric,
           verts.n * (verts.n - 1) // 2 - und.u AS null_dyads
    FROM verts, und, mut
"""
