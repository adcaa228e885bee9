"""Graph attention (GAT-style) embedding layer — the attention-weighted
counterpart of the SAGE mean aggregator (SURVEY.md §2A A7; Veličković et
al., ICLR'18 single-head form):

    e_uv = LeakyReLU(a_s·f_u + a_d·f_v)
    α_uv = softmax_u(e_uv)          (normalized over v's in-neighbors)
    h_v  = Σ_u α_uv · f_u

Spark-first shape — the whole layer is one declarative plan, no Python:

  1. per-vertex attention scores ``a_s·f`` / ``a_d·f`` are computed ONCE on
     the (small) vertex-feature table via ``F.aggregate(F.zip_with(...))``
     — JVM higher-order functions, not a UDF — then joined onto the edge
     list. Dot products happen |V| times, not |E| times.
  2. softmax = two analytic window functions over dst (max for numerical
     stability, sum for the normalizer) — exactly Spark's partial-window
     pattern, one shuffle on dst shared by both.
  3. the weighted combine is a hash aggregate with per-element
     sum(α·f_u[i]) expressions, same shuffle key, so AQE coalesces the
     exchanges.

Scale posture: no step materializes anything bigger than the edge list +
O(1) columns; a hot vertex costs one window partition O(deg). The feature
join uses the broadcast-gated helper pattern via plain Catalyst estimates
(features table is |V|×dim and grows with the graph).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_streaming_gnn_spark.graph.edges import EDGES_V_CTE, derive_vertex_embeddings
from flink_streaming_gnn_spark.plans.hints import maybe_broadcast
from flink_streaming_gnn_spark.sources.tables import load_table

DIM = 64
OUT_DIMS = 4  # elements of h_v surfaced as flat oracle-checked columns
LEAK = 0.2


def gat_weights(dim: int = DIM) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic attention vectors (rounded so SQL literals match)."""
    a_src = np.round(np.random.RandomState(46).randn(dim) * 0.1, 6)
    a_dst = np.round(np.random.RandomState(47).randn(dim) * 0.1, 6)
    return a_src, a_dst


def _dot_lit(feat_col: str, vec: np.ndarray):
    """JVM-side dot(feat, literal vector) via zip_with + aggregate."""
    arr = F.array(*[F.lit(float(x)) for x in vec])
    return F.aggregate(
        F.zip_with(F.col(feat_col).cast("array<double>"), arr, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def graph_gat_layer(spark: SparkSession, sf_dir: str) -> DataFrame:
    a_src, a_dst = gat_weights()
    edges = derive_vertex_embeddings(spark, sf_dir).distinct()
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("feat")
    )
    # per-vertex halves of the additive attention score (|V| dot products)
    scored = emb.select(
        "vec_id",
        F.col("feat").cast("array<double>").alias("feat"),
        _dot_lit("feat", a_src).alias("s_half"),
        _dot_lit("feat", a_dst).alias("d_half"),
    )
    src_side = maybe_broadcast(
        scored.select(
            F.col("vec_id").alias("src_v"),
            F.col("feat").alias("src_feat"),
            "s_half",
        )
    )
    dst_side = maybe_broadcast(scored.select(F.col("vec_id").alias("dst_v"), "d_half"))
    raw = F.col("s_half") + F.col("d_half")
    e_scored = (
        edges.join(src_side, "src_v")
        .join(dst_side, "dst_v")
        .withColumn(
            "score", F.when(raw > 0, raw).otherwise(F.lit(LEAK) * raw)
        )
    )
    w = Window.partitionBy("dst_v")
    e_soft = e_scored.withColumn(
        "ex", F.exp(F.col("score") - F.max("score").over(w))
    ).withColumn("alpha", F.col("ex") / F.sum("ex").over(w))
    return (
        e_soft.groupBy("dst_v")
        .agg(
            *[
                F.round(
                    F.sum(F.col("alpha") * F.element_at("src_feat", i)), 4
                ).alias(f"h{i}")
                for i in range(1, OUT_DIMS + 1)
            ]
        )
        .select(F.col("dst_v").alias("vec_id"), *[f"h{i}" for i in range(1, OUT_DIMS + 1)])
    )


def _vec_literal(vec: np.ndarray) -> str:
    return "[" + ", ".join(repr(float(x)) for x in vec) + "]"


def _gat_oracle_sql() -> str:
    a_src, a_dst = gat_weights()
    h_cols = ",\n               ".join(
        f"round(sum(alpha * CAST(src_feat[{i}] AS DOUBLE)), 4) AS h{i}"
        for i in range(1, OUT_DIMS + 1)
    )
    return f"""
        WITH {EDGES_V_CTE},
        de AS (SELECT DISTINCT src_v, dst_v FROM edges_v),
        scored AS (
            SELECT vec_id,
                   embedding AS feat,
                   list_dot_product(CAST(embedding AS DOUBLE[]), {_vec_literal(a_src)}) AS s_half,
                   list_dot_product(CAST(embedding AS DOUBLE[]), {_vec_literal(a_dst)}) AS d_half
            FROM embeddings
        ),
        es AS (
            SELECT e.dst_v, s.feat AS src_feat,
                   CASE WHEN s.s_half + d.d_half > 0
                        THEN s.s_half + d.d_half
                        ELSE {LEAK} * (s.s_half + d.d_half) END AS score
            FROM de e
            JOIN scored s ON s.vec_id = e.src_v
            JOIN scored d ON d.vec_id = e.dst_v
        ),
        soft AS (
            SELECT dst_v, src_feat,
                   exp(score - max(score) OVER (PARTITION BY dst_v)) AS ex
            FROM es
        ),
        norm AS (
            SELECT dst_v, src_feat,
                   ex / sum(ex) OVER (PARTITION BY dst_v) AS alpha
            FROM soft
        )
        SELECT dst_v AS vec_id,
               {h_cols}
        FROM norm GROUP BY dst_v
    """


QUERIES = {"graph_gat_layer": graph_gat_layer}
ORACLE = {"graph_gat_layer": _gat_oracle_sql()}
