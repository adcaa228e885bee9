"""Eigenvector centrality by power iteration (SURVEY.md §2B graph
algorithms family — the Bonacich centrality companion to
``graph/pagerank.py``'s damped variant and ``graph/hits.py``'s
hub/authority pair).

Spark-first shape: the symmetrized derived graph (purchase edges, both
directions) is built once and persisted; each power-iteration round is
one join (scores onto edges) + one per-vertex sum + one L2
renormalization — two shuffles, both keyed on vertex id, so consecutive
rounds reuse the partitioning. The per-round norm is a single scalar
aggregate read on the driver (O(1), bounded), matching the convergence-
read discipline of the other fixpoint operators. A fixed round count
keeps the job graph static.

Every vertex of the symmetrized graph has degree ≥ 1 (vertices are
derived from the edge list), so no dangling-mass correction is needed —
the iteration is exactly x ← A·x / ‖A·x‖₂.

Exact oracle: mechanically-unrolled MATERIALIZED round CTEs (the
pagerank/LPA trick) at the verify-scale round count; scores are rounded
to 6 dp at magnitudes ~1/√|V| so last-ulp accumulation-order differences
between engines cannot flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import derive_edges
from flink_streaming_gnn_spark.plans.truncate import release_superseded_checkpoints

ROUNDS = 8


def _sym_graph(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(vertices, symmetric edges) over the disjoint 2c / 2s+1 id space."""
    directed = (
        derive_edges(spark, sf_dir)
        .select((F.col("src") * 2).alias("a"), (F.col("dst") * 2 + 1).alias("b"))
        .distinct()
    )
    e = directed.union(directed.select(F.col("b").alias("a"), F.col("a").alias("b")))
    v = e.select(F.col("a").alias("v")).distinct()
    return v, e


@release_superseded_checkpoints
def eigenvector_scores(
    spark: SparkSession, sf_dir: str, rounds: int = ROUNDS
) -> DataFrame:
    v, e = _sym_graph(spark, sf_dir)
    v = v.persist()
    e = e.persist()
    n = v.count()  # scalar — drives the uniform start vector
    x = v.withColumn("x", F.lit(1.0 / n**0.5))
    try:
        # ONE job per round (the round-6 pagerank discipline): the
        # unnormalized propagation is checkpointed (leaf), and the L2
        # normalization rides lazily into the NEXT round's job as a
        # broadcast 1-row crossJoin — the round-5 version paid a separate
        # driver .first() for the norm plus a materialize count, i.e.
        # two extra full-|V| actions per round. `x` references its
        # checkpointed `y` twice (norm + values), which is plan-safe
        # precisely because y is a leaf.
        for _ in range(rounds):
            y = (
                e.join(x, e.a == x.v)
                .select("b", "x")
                .groupBy("b")
                .agg(F.sum("x").alias("y"))
                .localCheckpoint()
            )
            nrm = y.agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("nrm"))
            x = y.crossJoin(F.broadcast(nrm)).select(
                F.col("b").alias("v"), (F.col("y") / F.col("nrm")).alias("x")
            )
        return x.localCheckpoint()
    finally:
        e.unpersist()
        v.unpersist()


def graph_eigenvector_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry key: top-100 vertices by eigenvector score (6 dp), the
    ranking summary a centrality consumer reads. Exact oracle via
    unrolled round CTEs; verify-scale fixtures run half the rounds."""
    rounds = ROUNDS // 2 if _is_verify_scale(sf_dir) else ROUNDS
    x = eigenvector_scores(spark, sf_dir, rounds=rounds)
    top = (
        x.select("v", F.round("x", 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("v"))
        .limit(100)
    )
    rows = top.collect()  # ≤100 rows — summary, not data path
    x.unpersist()
    return spark.createDataFrame(rows, schema="v long, score double")


def _is_verify_scale(sf_dir: str) -> bool:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    try:
        return bool(m) and float(m.group(1).rstrip(".")) <= 0.01
    except ValueError:
        return False


def _eigenvector_oracle_sql(rounds: int = ROUNDS // 2) -> str:
    """Unrolled power iteration at the verify-scale round count. Every
    CTE is MATERIALIZED — each round's scores feed both the next matvec
    and its own norm."""
    blocks = [
        """d AS MATERIALIZED (
            SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        e AS MATERIALIZED (
            SELECT a, b FROM d UNION ALL SELECT b AS a, a AS b FROM d
        ),
        verts AS MATERIALIZED (
            SELECT DISTINCT a AS v FROM e
        ),
        n AS (SELECT count(*) AS n FROM verts),
        x0 AS MATERIALIZED (
            SELECT v, 1.0 / sqrt(n.n) AS x FROM verts CROSS JOIN n
        )"""
    ]
    for r in range(1, rounds + 1):
        blocks.append(f"""y{r} AS MATERIALIZED (
            SELECT e.b AS v, sum(p.x) AS y
            FROM e JOIN x{r - 1} p ON p.v = e.a
            GROUP BY e.b
        ),
        nrm{r} AS (SELECT sqrt(sum(y * y)) AS nrm FROM y{r}),
        x{r} AS MATERIALIZED (
            SELECT v, y / nrm AS x FROM y{r} CROSS JOIN nrm{r}
        )""")
    body = ",\n        ".join(blocks)
    return f"""
        WITH {body}
        SELECT CAST(v AS BIGINT) AS v, round(x, 6) AS score
        FROM x{rounds}
        ORDER BY round(x, 6) DESC, v
        LIMIT 100
    """


QUERIES = {"graph_eigenvector_centrality": graph_eigenvector_centrality}
ORACLE = {"graph_eigenvector_centrality": _eigenvector_oracle_sql()}
