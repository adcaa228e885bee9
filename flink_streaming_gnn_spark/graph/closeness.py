"""Seed-set closeness / harmonic centrality — labeled multi-source BFS
(SURVEY.md §2 graph tier; the per-seed companion of ``graph/bfs.py``'s
min-hop levels, answering "how central is each landmark?" instead of "how
far is everything from the landmark set?").

Spark-first shape: the BFS frontier carries a seed label, so states are
(seed, vertex) pairs and each hop is one join (frontier ⋈ edges) + one
distinct + one anti-join against the visited set — all shuffling on
vertex id, reusing the partitioning round to round, exactly the
``bfs.py`` loop with a wider key. Per-seed aggregates (reached count,
total distance — exact integers) reduce the state table to |seeds| rows;
closeness = reached/sum_dist and harmonic = Σ 1/d are derived scalars
rounded to 6 dp so the float division order can't move the hash.

Seeds are customers with c_custkey % 500 == 0 (a % 1000 == 0 in the
disjoint 2c / 2s+1 id space) — a deterministic, scale-stable landmark
density: |seeds| grows linearly with sf, and the labeled-BFS state is
|seeds| × |V| worst-case, the standard landmark/pivot sampling used by
approximate-closeness algorithms at scale (Eppstein–Wang). At 100 TB you
would cap |seeds| at a constant (e.g. 1024 landmarks) — density-by-modulo
does exactly that per shard.

The DuckDB oracle is a recursive CTE over (seed, vertex, depth) states,
so the driver hash-matches the entire iterative computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import EDGES_CTE, derive_edges

MAX_HOPS = 6
SEED_MOD = 1000  # a % 1000 == 0 in 2c-space ⇔ c_custkey % 500 == 0


def _undirected(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        derive_edges(spark, sf_dir)
        .select((F.col("src") * 2).alias("a"), (F.col("dst") * 2 + 1).alias("b"))
        .distinct()
    )
    return e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))


def graph_closeness_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-seed: vertices reached within MAX_HOPS, total hop distance,
    closeness (reached/sum_dist) and harmonic centrality (Σ 1/d)."""
    edges = _undirected(spark, sf_dir).localCheckpoint()
    seeds = (
        edges.select("a")
        .distinct()
        .filter((F.col("a") % SEED_MOD) == 0)
        .select(F.col("a").alias("s"))
    )
    # labeled BFS state: one row per (seed, vertex) at first-discovery depth.
    # localCheckpoint per hop — levels is referenced twice per round
    # (anti-join + union), same lineage discipline as bfs.py/components.py.
    levels = (
        seeds.withColumn("v", F.col("s")).withColumn("d", F.lit(0)).localCheckpoint()
    )
    frontier = levels
    for hop in range(1, MAX_HOPS + 1):
        nxt = (
            frontier.join(edges, frontier.v == edges.a)
            .select("s", F.col("b").alias("v"))
            .distinct()
            .join(levels, ["s", "v"], "left_anti")
            .withColumn("d", F.lit(hop))
            .localCheckpoint()
        )
        if nxt.count() == 0:  # O(1) convergence read — never rows
            break
        levels = levels.union(nxt).localCheckpoint()
        frontier = nxt
    out = (
        levels.filter(F.col("d") > 0)
        .groupBy("s")
        .agg(
            F.count("*").cast("long").alias("n_reached"),
            F.sum("d").cast("long").alias("sum_dist"),
            F.round(F.count("*") / F.sum("d"), 6).alias("closeness"),
            F.round(F.sum(F.lit(1.0) / F.col("d")), 6).alias("harmonic"),
        )
        .select(F.col("s").cast("long").alias("s"), "n_reached", "sum_dist",
                "closeness", "harmonic")
    )
    rows = out.collect()  # |seeds| rows — summary, not data path
    return spark.createDataFrame(
        rows, schema="s long, n_reached long, sum_dist long, closeness double, harmonic double"
    )


QUERIES = {"graph_closeness_centrality": graph_closeness_centrality}

ORACLE = {
    "graph_closeness_centrality": f"""
        WITH RECURSIVE {EDGES_CTE},
        de AS (SELECT DISTINCT src * 2 AS a, dst * 2 + 1 AS b FROM edges),
        ue AS (SELECT a, b FROM de UNION ALL SELECT b, a FROM de),
        seeds AS (SELECT DISTINCT a AS s FROM ue WHERE a % {SEED_MOD} = 0),
        bfs(s, v, d) AS (
            SELECT s, s, 0 FROM seeds
            UNION
            SELECT bfs.s, ue.b, bfs.d + 1
            FROM bfs JOIN ue ON ue.a = bfs.v
            WHERE bfs.d < {MAX_HOPS}
        ),
        dist AS (SELECT s, v, min(d) AS d FROM bfs GROUP BY s, v)
        SELECT CAST(s AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n_reached,
               CAST(sum(d) AS BIGINT) AS sum_dist,
               round(count(*) * 1.0 / sum(d), 6) AS closeness,
               round(sum(1.0 / d), 6) AS harmonic
        FROM dist WHERE d > 0 GROUP BY s
    """,
}
