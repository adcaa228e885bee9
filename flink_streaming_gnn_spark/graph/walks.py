"""Deterministic random walks (DeepWalk/node2vec-style corpus generation —
the classical unsupervised companion to the reference's GNN embeddings;
SURVEY.md §2A A3/A10 consume exactly such per-vertex context sequences).

A "random" walk that is reproducible across engines: at each step the
walker at vertex ``cur`` moves to the out-neighbor ``u`` minimizing
``md5(cur || '|' || u || '|' || step)`` — a content-hash draw that is
uniform over neighbors, independent across steps (the step tag reshuffles
the order), and byte-identical in Spark and DuckDB, so the full walk table
hash-matches the oracle.

Spark-first shape: each step is one equi-join on the current frontier's
vertex + one WindowGroupLimit rank (row_number ≤ 1 per walker) — the same
pushed-down top-1-per-key pattern as ``graph_neighbor_sample``. WALK_LEN
is a compile-time constant, so the plan is a fixed acyclic chain (no
driver iteration). Walks that reach a sink vertex keep NULL continuations
(left joins), matching the oracle.

At 100 TB: per-step cost is |walkers| × avg-degree through a hash join;
the frontier never exceeds the seed count, and the rank is top-1 per
walker (no full sort). Seeds here are a deterministic 1-in-50 id slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_streaming_gnn_spark.graph.edges import EDGES_V_CTE, derive_vertex_embeddings

SEED_MOD = 50  # seeds = vertices with v % SEED_MOD == 0
WALK_LEN = 3  # steps taken after the seed


def _step(frontier: DataFrame, e: DataFrame, cur_col: str, step: int) -> DataFrame:
    """Extend each walk by one hash-drawn neighbor of ``cur_col`` (NULL if
    the walker sits on a sink or an already-dead walk)."""
    nxt = e.select(
        F.col("src_v").alias("_cur"), F.col("dst_v").alias(f"v{step}")
    )
    joined = frontier.join(nxt, frontier[cur_col] == nxt._cur, "left")
    h = F.md5(
        F.concat_ws("|", F.col(cur_col), F.col(f"v{step}"), F.lit(str(step)))
    )
    w = Window.partitionBy("seed").orderBy(h.asc_nulls_last(), F.col(f"v{step}").asc_nulls_last())
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_cur")
    )


def graph_random_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derive_vertex_embeddings(spark, sf_dir).distinct()
    seeds = (
        e.select(F.col("src_v").alias("seed"))
        .filter(F.col("seed") % SEED_MOD == 0)
        .distinct()
    )
    walks = seeds
    prev = "seed"
    for step in range(1, WALK_LEN + 1):
        walks = _step(walks, e, prev, step)
        prev = f"v{step}"
    return walks.select("seed", *[f"v{s}" for s in range(1, WALK_LEN + 1)])


def _walk_oracle_sql() -> str:
    ctes = []
    prev_rel, prev_col = "seeds", "seed"
    for step in range(1, WALK_LEN + 1):
        carry = ", ".join(
            ["seed"] + [f"v{s}" for s in range(1, step)]
        )
        ctes.append(
            f"""s{step} AS (
            SELECT {carry}, v{step} FROM (
                SELECT f.*, e.dst_v AS v{step},
                       row_number() OVER (
                           PARTITION BY f.seed
                           ORDER BY md5(CAST(f.{prev_col} AS VARCHAR) || '|' ||
                                        CAST(e.dst_v AS VARCHAR) || '|' || '{step}')
                                    NULLS LAST,
                                    e.dst_v NULLS LAST
                       ) AS rn
                FROM {prev_rel} f LEFT JOIN e ON e.src_v = f.{prev_col}
            ) WHERE rn = 1
        )"""
        )
        prev_rel, prev_col = f"s{step}", f"v{step}"
    cols = ", ".join(["seed"] + [f"v{s}" for s in range(1, WALK_LEN + 1)])
    joined_ctes = ",\n        ".join(ctes)
    return f"""
        WITH {EDGES_V_CTE},
        e AS (SELECT DISTINCT src_v, dst_v FROM edges_v),
        seeds AS (
            SELECT DISTINCT src_v AS seed FROM e WHERE src_v % {SEED_MOD} = 0
        ),
        {joined_ctes}
        SELECT {cols} FROM {prev_rel}
    """


QUERIES = {"graph_random_walk": graph_random_walk}
ORACLE = {"graph_random_walk": _walk_oracle_sql()}
