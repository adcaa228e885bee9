"""K-hop ego-subgraph extraction (SURVEY.md §2A A3/A10: the mini-batch a
GNN trainer actually consumes is the seed's receptive field — this is the
subgraph-materialization companion to ``graph_neighbor_sample``'s fanout
draw and ``graph_sage_2layer``'s 2-hop receptive field).

Per seed vertex, the union of edges reachable in ≤ 2 hops, tagged with
the hop that discovered them. Spark-first: hop k is one equi-join of the
hop-(k-1) frontier against the edge list — the frontier is seed-bounded,
so each join's left side is small while the edge list stays partitioned
on src_v; dedup per (seed, hop, edge) is one hash agg.

At 100 TB: fanout growth is the known hazard (hop-2 of a hub explodes);
the production guard is the fixed-fanout sample (graph_neighbor_sample)
applied per hop before expansion — composition is one extra
WindowGroupLimit per hop. Seeds here are a deterministic 1-in-100 slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import EDGES_V_CTE, derive_vertex_embeddings

SEED_MOD = 100


def graph_ego_subgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derive_vertex_embeddings(spark, sf_dir).distinct()
    seeds = (
        e.select(F.col("src_v").alias("seed"))
        .filter(F.col("seed") % SEED_MOD == 0)
        .distinct()
    )
    hop1 = seeds.join(e, seeds.seed == e.src_v).select(
        "seed", F.lit(1).cast("long").alias("hop"), "src_v", "dst_v"
    )
    frontier = hop1.select("seed", F.col("dst_v").alias("v")).distinct()
    hop2 = frontier.join(e, frontier.v == e.src_v).select(
        "seed", F.lit(2).cast("long").alias("hop"), "src_v", "dst_v"
    )
    return hop1.unionByName(hop2).distinct()


QUERIES = {"graph_ego_subgraph": graph_ego_subgraph}

ORACLE = {
    "graph_ego_subgraph": f"""
        WITH {EDGES_V_CTE},
        e AS (SELECT DISTINCT src_v, dst_v FROM edges_v),
        seeds AS (
            SELECT DISTINCT src_v AS seed FROM e WHERE src_v % {SEED_MOD} = 0
        ),
        hop1 AS (
            SELECT seed, CAST(1 AS BIGINT) AS hop, e.src_v, e.dst_v
            FROM seeds JOIN e ON e.src_v = seeds.seed
        ),
        frontier AS (SELECT DISTINCT seed, dst_v AS v FROM hop1),
        hop2 AS (
            SELECT seed, CAST(2 AS BIGINT) AS hop, e.src_v, e.dst_v
            FROM frontier JOIN e ON e.src_v = frontier.v
        )
        SELECT DISTINCT * FROM (
            SELECT * FROM hop1 UNION ALL SELECT * FROM hop2
        )
    """,
}
