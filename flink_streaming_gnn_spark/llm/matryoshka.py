"""Matryoshka truncation-recall evaluation (SURVEY.md north-star
"similarity search" tier): how much nearest-neighbor quality survives
truncating embeddings to their first ``TRUNC_DIMS`` coordinates —
the evaluation behind Matryoshka Representation Learning (Kusupati et
al. 2022) and every "use the short prefix for the cheap ANN tier"
deployment. For each probe, top-``K`` neighbors are computed under the
full 64-dim cosine AND under the 16-dim prefix cosine; recall@K is the
overlap fraction.

Spark-first shape: the probe set is scale-invariant (``vec_id <
N_PROBES``, the ``ml_knn_classify`` discipline), probes broadcast, and
BOTH cosines are computed in the SAME corpus pass (one scan, two
ranking windows partitioned by probe — no second scan for the truncated
tier). The overlap count is an equi-join of the two rank-≤K row sets on
(probe, neighbor) — integer-exact, so recall is a deterministic
rational. Rank cuts use rounded-cosine + vec_id total order (the
repo-wide knn tie discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.functions.arrays import dot_expr
from flink_streaming_gnn_spark.sources.tables import load_table

N_PROBES = 50
K = 5
TRUNC_DIMS = 16


def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    full = "cast(embedding as array<double>)"
    trunc = f"slice(cast(embedding as array<double>), 1, {TRUNC_DIMS})"
    # norms are per-VECTOR, so compute them BEFORE the 50× probe fan-out
    # (projecting them after the join would redo 64-dim reductions per
    # pair — project-before-fanout is the whole cosine denominator)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        F.expr(f"sqrt({dot_expr(full, full)})").alias("nf"),
        F.expr(f"sqrt({dot_expr(trunc, trunc)})").alias("nt"),
    )
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("pid"),
        F.col("v").alias("pv"),
        F.col("nf").alias("pnf"),
        F.col("nt").alias("pnt"),
    )
    pairs = emb.join(F.broadcast(probes), F.col("vec_id") != F.col("pid"))
    dot_full = F.expr(dot_expr("v", "pv"))
    dot_tr = F.expr(
        dot_expr(f"slice(v, 1, {TRUNC_DIMS})", f"slice(pv, 1, {TRUNC_DIMS})")
    )
    scored = pairs.select(
        "pid",
        "vec_id",
        F.round(dot_full / (F.col("nf") * F.col("pnf")), 6).alias("c_full"),
        F.round(dot_tr / (F.col("nt") * F.col("pnt")), 6).alias("c_tr"),
    )
    wf = Window.partitionBy("pid").orderBy(F.col("c_full").desc(), "vec_id")
    wt = Window.partitionBy("pid").orderBy(F.col("c_tr").desc(), "vec_id")
    ranked = scored.select(
        "pid",
        "vec_id",
        F.row_number().over(wf).alias("rk_full"),
        F.row_number().over(wt).alias("rk_tr"),
    )
    top_full = ranked.filter(F.col("rk_full") <= K).select("pid", "vec_id")
    top_tr = ranked.filter(F.col("rk_tr") <= K).select("pid", "vec_id")
    common = top_full.join(top_tr, ["pid", "vec_id"]).groupBy("pid").agg(
        F.count("*").cast("long").alias("n_common")
    )
    return (
        probes.select("pid")
        .join(common, "pid", "left")
        .select(
            F.col("pid").alias("probe_id"),
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            (F.coalesce("n_common", F.lit(0)) / F.lit(float(K))).alias("recall_at_k"),
        )
        .orderBy("probe_id")
    )


def _cos(a: str, b: str) -> str:
    return (
        f"round(list_dot_product({a}, {b})"
        f" / (sqrt(list_dot_product({a}, {a}))"
        f" * sqrt(list_dot_product({b}, {b}))), 6)"
    )


ORACLE_SQL = f"""
    WITH probes AS MATERIALIZED (
        SELECT vec_id AS pid, CAST(embedding AS DOUBLE[]) AS pv
        FROM embeddings WHERE vec_id < {N_PROBES}
    ),
    scored AS MATERIALIZED (
        SELECT p.pid, e.vec_id,
               {_cos("CAST(e.embedding AS DOUBLE[])", "p.pv")} AS c_full,
               {_cos(f"CAST(e.embedding AS DOUBLE[])[1:{TRUNC_DIMS}]", f"p.pv[1:{TRUNC_DIMS}]")} AS c_tr
        FROM embeddings e JOIN probes p ON e.vec_id <> p.pid
    ),
    ranked AS MATERIALIZED (
        SELECT pid, vec_id,
               row_number() OVER (PARTITION BY pid
                                  ORDER BY c_full DESC, vec_id) AS rk_full,
               row_number() OVER (PARTITION BY pid
                                  ORDER BY c_tr DESC, vec_id) AS rk_tr
        FROM scored
    ),
    common AS (
        SELECT a.pid, CAST(count(*) AS BIGINT) AS n_common
        FROM (SELECT pid, vec_id FROM ranked WHERE rk_full <= {K}) a
        JOIN (SELECT pid, vec_id FROM ranked WHERE rk_tr <= {K}) b
          ON a.pid = b.pid AND a.vec_id = b.vec_id
        GROUP BY a.pid
    )
    SELECT p.pid AS probe_id,
           CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common,
           coalesce(c.n_common, 0) / {float(K)} AS recall_at_k
    FROM probes p LEFT JOIN common c ON c.pid = p.pid
    ORDER BY probe_id
"""

QUERIES = {"emb_matryoshka_recall": emb_matryoshka_recall}
ORACLE = {"emb_matryoshka_recall": ORACLE_SQL}
