"""GIN convolution layer (Xu et al. ICLR 2019, "How Powerful are Graph
Neural Networks?") — completes the engine's GNN-architecture zoo next to
SAGE (mean-agg + Arrow numpy forward), GAT (attention), and GCN
(normalized sum, all-JVM): GIN is the *sum*-aggregation + MLP design that
is provably as expressive as the WL test, and its 2-layer MLP head shows
a full MLP riding whole-stage codegen as literal expressions.

    agg_v = (1 + ε)·x_v + Σ_{(u,v) ∈ E} x_u          (raw sum, no norm)
    h_v   = W2 · relu(W1 · agg_v)                     (64→8→4 MLP)

Spark-first: the neighbor sum is one hash aggregate with 64 sum()
expressions riding a single shuffle on dst_v (map-side partials absorb
hubs); the self term joins in as a vertex-table projection; the MLP is
8 + 4 literal dot-product expressions — zero Python end-to-end. Weights
are seeded/rounded and inlined into the DuckDB oracle, so aggregation,
ε-weighting, both matmuls, and the ReLU are hash-checked.

At 100 TB: identical shape to graph_gcn_layer — degrees aren't even
needed (sum aggregation), so this is one edge-subtree cheaper.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import EDGES_V_CTE, derive_vertex_embeddings
from flink_streaming_gnn_spark.plans.hints import maybe_broadcast
from flink_streaming_gnn_spark.sources.tables import load_table

DIM = 64
HID = 8
OUT_DIM = 4
EPS = 0.1


def gin_weights() -> tuple[np.ndarray, np.ndarray]:
    w1 = np.round(np.random.RandomState(47).randn(HID, DIM) * 0.1, 6)
    w2 = np.round(np.random.RandomState(48).randn(OUT_DIM, HID) * 0.1, 6)
    return w1, w2


def graph_gin_layer(spark: SparkSession, sf_dir: str) -> DataFrame:
    w1, w2 = gin_weights()
    e = derive_vertex_embeddings(spark, sf_dir).distinct()
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("feat")
    )
    nbr_sum = (
        e.join(maybe_broadcast(emb), e.src_v == emb.vec_id)
        .groupBy("dst_v")
        .agg(
            *[
                F.sum(F.element_at("feat", i)).alias(f"s{i}")
                for i in range(1, DIM + 1)
            ]
        )
    )
    # (1+ε)·x_v + Σ; vertices with no in-neighbors keep just the self term
    agg = emb.join(nbr_sum, emb.vec_id == nbr_sum.dst_v, "left").select(
        "vec_id",
        *[
            (
                F.lit(1.0 + EPS) * F.element_at("feat", i)
                + F.coalesce(F.col(f"s{i}"), F.lit(0.0))
            ).alias(f"a{i}")
            for i in range(1, DIM + 1)
        ],
    )
    hid = agg.select(
        "vec_id",
        *[
            F.greatest(
                F.lit(0.0),
                sum(
                    (F.col(f"a{i}") * float(w1[j - 1, i - 1]) for i in range(2, DIM + 1)),
                    F.col("a1") * float(w1[j - 1, 0]),
                ),
            ).alias(f"r{j}")
            for j in range(1, HID + 1)
        ],
    )
    # "+ 0.0" normalizes IEEE negative zero after rounding (the output
    # layer has no ReLU, so tiny negatives round to -0.0 in one engine and
    # 0.0 in the other); same term in the oracle SQL
    return hid.select(
        "vec_id",
        *[
            (
                F.round(
                    sum(
                        (F.col(f"r{i}") * float(w2[j - 1, i - 1]) for i in range(2, HID + 1)),
                        F.col("r1") * float(w2[j - 1, 0]),
                    ),
                    4,
                )
                + F.lit(0.0)
            ).alias(f"h{j}")
            for j in range(1, OUT_DIM + 1)
        ],
    )


def _gin_oracle_sql() -> str:
    w1, w2 = gin_weights()
    sum_cols = ",\n               ".join(
        f"sum(feat[{i}]) AS s{i}" for i in range(1, DIM + 1)
    )
    agg_cols = ",\n               ".join(
        f"(({1.0 + EPS!r}) * feat[{i}] + COALESCE(s{i}, 0.0)) AS a{i}"
        for i in range(1, DIM + 1)
    )
    hid_cols = ",\n               ".join(
        "greatest(0.0, "
        + " + ".join(f"a{i} * ({w1[j - 1, i - 1]!r})" for i in range(1, DIM + 1))
        + f") AS r{j}"
        for j in range(1, HID + 1)
    )
    out_cols = ",\n               ".join(
        "(round("
        + " + ".join(f"r{i} * ({w2[j - 1, i - 1]!r})" for i in range(1, HID + 1))
        + f", 4) + 0.0) AS h{j}"
        for j in range(1, OUT_DIM + 1)
    )
    return f"""
        WITH {EDGES_V_CTE},
        e AS (SELECT DISTINCT src_v, dst_v FROM edges_v),
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS feat FROM embeddings),
        nbr AS (
            SELECT e.dst_v,
               {sum_cols}
            FROM e JOIN emb ON emb.vec_id = e.src_v
            GROUP BY e.dst_v
        ),
        agg AS (
            SELECT emb.vec_id,
               {agg_cols}
            FROM emb LEFT JOIN nbr ON nbr.dst_v = emb.vec_id
        ),
        hid AS (
            SELECT vec_id,
               {hid_cols}
            FROM agg
        )
        SELECT vec_id,
               {out_cols}
        FROM hid
    """


QUERIES = {"graph_gin_layer": graph_gin_layer}
ORACLE = {"graph_gin_layer": _gin_oracle_sql()}
