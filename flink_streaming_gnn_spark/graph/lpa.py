"""Synchronous label-propagation community detection (Raghavan et al.,
2007) over the derived bipartite graph — the fourth iterative graph
operator, and like graph_bfs_levels one whose FIXED-ROUND synchronous form
is exactly SQL-expressible: each round is "take the most frequent neighbor
label, ties to the smallest label", i.e. one groupBy + one ranking window
— so the DuckDB oracle is ROUNDS mechanically-generated CTE blocks and the
driver hash-matches the whole fixpoint computation.

Spark-first shape per round: edge⋈labels (shuffle on vertex id), count per
(vertex, label) (same partitioning), one row_number window (count desc,
label asc — fully deterministic), filter rank 1. ROUNDS is fixed (no
convergence read) so the job graph is static and batch≡oracle agree
bit-for-bit. Labels start as the vertex id; after 4 rounds on this
corpus's dense bipartite core the big communities are stable.

Vertex-id space: disjoint 2c / 2s+1 (components.py convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import EDGES_CTE, derive_edges

ROUNDS = 4


def _undirected(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        derive_edges(spark, sf_dir)
        .select((F.col("src") * 2).alias("a"), (F.col("dst") * 2 + 1).alias("b"))
        .distinct()
    )
    return e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))


def lpa_labels(spark: SparkSession, sf_dir: str, rounds: int = ROUNDS) -> DataFrame:
    edges = _undirected(spark, sf_dir).persist()
    labels = edges.select(F.col("a").alias("v")).distinct().withColumn(
        "lbl", F.col("v")
    )
    w = Window.partitionBy("v").orderBy(F.col("cnt").desc(), F.col("lbl").asc())
    for _ in range(rounds):
        votes = (
            edges.join(labels, edges.b == labels.v)
            .groupBy(F.col("a").alias("v2"), "lbl")
            .agg(F.count("*").alias("cnt"))
            .withColumnRenamed("v2", "v")
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("v", "lbl")
        )
    out = labels
    edges.unpersist()
    return out


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community summary after ROUNDS synchronous LPA rounds: per-community
    vertex count and customer/supplier split (community = propagated label,
    reported only for communities with ≥ 2 members to keep the result
    scale-stable)."""
    labels = lpa_labels(spark, sf_dir)
    return (
        labels.groupBy("lbl")
        .agg(
            F.count("*").cast("long").alias("n_vertices"),
            F.sum(((F.col("v") % 2) == 0).cast("long")).cast("long").alias("n_customers"),
            F.sum(((F.col("v") % 2) == 1).cast("long")).cast("long").alias("n_suppliers"),
        )
        .filter(F.col("n_vertices") >= 2)
        .select(
            F.col("lbl").cast("long").alias("community"),
            "n_vertices",
            "n_customers",
            "n_suppliers",
        )
    )


def _lpa_oracle_sql(rounds: int = ROUNDS) -> str:
    """Generate the fixed-round LPA oracle: one (votes, ranked, labels)
    CTE block per round — mechanically the same plan DuckDB-side."""
    blocks = [
        f"""WITH {EDGES_CTE},
        de AS (SELECT DISTINCT src * 2 AS a, dst * 2 + 1 AS b FROM edges),
        ue AS (SELECT a, b FROM de UNION ALL SELECT b, a FROM de),
        l0 AS (SELECT DISTINCT a AS v, a AS lbl FROM ue)"""
    ]
    for r in range(1, rounds + 1):
        blocks.append(
            f""",
        v{r} AS (
            SELECT ue.a AS v, l{r - 1}.lbl, count(*) AS cnt
            FROM ue JOIN l{r - 1} ON l{r - 1}.v = ue.b
            GROUP BY ue.a, l{r - 1}.lbl
        ),
        l{r} AS (
            SELECT v, lbl FROM (
                SELECT v, lbl,
                       row_number() OVER (
                           PARTITION BY v ORDER BY cnt DESC, lbl ASC
                       ) AS rn
                FROM v{r}
            ) WHERE rn = 1
        )"""
        )
    blocks.append(
        f"""
        SELECT CAST(lbl AS BIGINT) AS community,
               CAST(count(*) AS BIGINT) AS n_vertices,
               CAST(sum(CASE WHEN v % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_customers,
               CAST(sum(CASE WHEN v % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_suppliers
        FROM l{rounds}
        GROUP BY lbl
        HAVING count(*) >= 2"""
    )
    return "".join(blocks)


QUERIES = {"graph_label_propagation": graph_label_propagation}

ORACLE = {"graph_label_propagation": _lpa_oracle_sql()}
