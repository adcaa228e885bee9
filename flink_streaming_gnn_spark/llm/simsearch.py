"""Similarity search over the embedding column (SURVEY.md §2B
simsearch_cosine_knn; north_star "similarity search").

Three tiers:
- brute-force top-k (the correctness baseline, oracle-checked);
- BucketedRandomProjectionLSH (pyspark.ml) — bucketed candidate join;
- IVF-style coarse quantization — seeded random centroids, nearest-cell
  assignment JVM-side, probe-N-cells search. The IVF shape is the 100 TB
  path: the index is just a (cell → vectors) partitioned table, searches
  are equi-joins on cell id, and everything shuffles on small keys.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.functions.arrays import cosine_expr, dot_expr
from flink_streaming_gnn_spark.graph.sage import DIM
from flink_streaming_gnn_spark.sources.tables import load_table

N_PROBES = 50
TOP_K = 20


def simsearch_cosine_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-20 for the first 50 vec_ids (BASELINE
    ``vector_knn_cosine`` shape): broadcast the probe set against the full
    collection, JVM-side double-precision cosine, ranking window with
    vec_id tiebreak. At scale: probes broadcast, collection scanned once,
    per-probe top-k via the same window (WindowGroupLimit keeps k rows
    per partition before the final merge)."""
    e = load_table(spark, sf_dir, "embeddings")
    # Pre-compute each side's norm once (N+P folds) so the pair-level work
    # is a single dot fold instead of three — the doubles are identical to
    # folding inside the pair, so oracle parity is preserved.
    probes = e.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("p_emb"),
        F.sqrt(F.expr(dot_expr("embedding", "embedding"))).alias("p_norm"),
    )
    cands = e.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        F.sqrt(F.expr(dot_expr("embedding", "embedding"))).alias("c_norm"),
    )
    scored = (
        F.broadcast(probes)
        .crossJoin(cands)
        .filter(F.col("probe_id") != F.col("cand_id"))
        .select(
            "probe_id",
            "cand_id",
            (
                F.expr(dot_expr("p_emb", "c_emb")) / (F.col("p_norm") * F.col("c_norm"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            "cand_id",
            F.round("cos", 6).alias("cos"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ivf_centroids(n_cells: int = 16, dim: int = DIM, seed: int = 7) -> np.ndarray:
    """Seeded random unit centroids (stand-in for a k-means pass)."""
    c = np.random.RandomState(seed).randn(n_cells, dim)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _cell_expr(emb_col: str, centroids: np.ndarray) -> F.Column:
    """JVM-side argmax over centroid dot products: greatest() over the
    per-cell scores, then a chained when() to recover the argmax index.
    No Python boundary — the quantizer is pure codegen'd expressions."""
    scores = [
        F.expr(
            dot_expr(emb_col, "array(" + ",".join(repr(float(x)) for x in c) + ")")
        )
        for c in centroids
    ]
    best = F.greatest(*scores)
    cell = F.lit(None).cast("int")
    expr = None
    for i, s in enumerate(scores):
        cond = s == best
        expr = F.when(cond, F.lit(i)) if expr is None else expr.when(cond, F.lit(i))
    return expr


def simsearch_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid cell
    (JVM expression argmax), then search each probe only within its own
    top-3 cells — an equi-join on cell id replaces the cross join.
    Rows-only check (approximate by construction); recall vs brute force
    is asserted in tests/test_llm.py."""
    cents = ivf_centroids()
    e = load_table(spark, sf_dir, "embeddings")
    assigned = e.select(
        "vec_id", "embedding", _cell_expr("embedding", cents).alias("cell")
    )
    # probe cells: top-3 centroid scores per probe vector
    probe_rows = assigned.filter(F.col("vec_id") < N_PROBES)
    probe_cells = None
    for rank in range(3):
        pc = probe_rows.select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("p_emb"),
            _nth_cell_expr("embedding", cents, rank).alias("cell"),
        )
        probe_cells = pc if probe_cells is None else probe_cells.unionByName(pc)
    cands = assigned.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb"), "cell"
    )
    scored = (
        F.broadcast(probe_cells)
        .join(cands, "cell")
        .filter(F.col("probe_id") != F.col("cand_id"))
        .select("probe_id", "cand_id", F.expr(cosine_expr("p_emb", "c_emb")).alias("cos"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("probe_id", "cand_id", F.round("cos", 6).alias("cos"),
                F.col("rank").cast("long").alias("rank"))
    )


def _nth_cell_expr(emb_col: str, centroids: np.ndarray, n: int) -> F.Column:
    """Index of the (n+1)-th best centroid via iterated greatest-exclusion."""
    scores = [
        F.expr(dot_expr(emb_col, "array(" + ",".join(repr(float(x)) for x in c) + ")"))
        for c in centroids
    ]
    arr = F.array(*scores)
    sorted_desc = F.reverse(F.array_sort(arr))
    target = F.element_at(sorted_desc, n + 1)
    return (F.array_position(arr, target) - 1).cast("int")


def simsearch_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN via pyspark.ml
    BucketedRandomProjectionLSH: bucketed candidate join, then exact
    re-rank. Rows-only (randomized family; recall asserted in tests)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("v")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="v", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=42
    )
    model = lsh.fit(e)
    probes = e.filter(F.col("vec_id") < N_PROBES)
    pairs = model.approxSimilarityJoin(probes, e, 8.0, distCol="l2")
    return (
        pairs.filter(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("probe_id"),
            F.col("datasetB.vec_id").alias("cand_id"),
            F.round("l2", 6).alias("l2"),
        )
    )


QUERIES = {
    "simsearch_cosine_knn": simsearch_cosine_knn,
    "vector_knn_cosine": simsearch_cosine_knn,  # BASELINE.md headline name
    "simsearch_ivf": simsearch_ivf,
    "simsearch_lsh": simsearch_lsh,
}

_DUCK_COS_PC = (
    "(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(p.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))))"
)

_KNN_SQL = f"""
    WITH scored AS (
        SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
               {_DUCK_COS_PC} AS cos
        FROM embeddings p JOIN embeddings c ON p.vec_id <> c.vec_id
        WHERE p.vec_id < {N_PROBES}
    ),
    ranked AS (
        SELECT probe_id, cand_id, cos,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cos DESC, cand_id) AS rank
        FROM scored
    )
    SELECT probe_id, cand_id, round(cos, 6) AS cos, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
"""

ORACLE = {
    "simsearch_cosine_knn": _KNN_SQL,
    "vector_knn_cosine": _KNN_SQL,
    # simsearch_ivf / simsearch_lsh: rows-only (approximate; recall pinned in tests)
}
