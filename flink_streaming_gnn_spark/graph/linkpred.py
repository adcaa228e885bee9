"""Common-neighbor / Jaccard link-prediction features (SURVEY.md §2B graph
ops; the classical structural scores a link-prediction head consumes next
to the learned GNN embeddings — reference A13's readout counterpart for
edges).

Semantics: for supplier pairs (a < b), the customers they share in the
bipartite purchase graph — common-neighbor count, each side's degree, and
the Jaccard coefficient |N(a)∩N(b)| / |N(a)∪N(b)|. Top pairs by Jaccard
(deterministic tiebreak) keep the result bounded.

Spark-first shape: the pair generation is the wedge join e1(c,a) ⋈ e2(c,b)
on the shared customer — an equi-join whose fan-out is Σ_c deg(c)², the
same bound as every common-neighbor system; degrees join in broadcast-gated
(the degree table is |V|-sized). At 100 TB the standard refinement is to
cap per-customer degree (a customer connected to everything contributes
O(deg²) pairs and no signal) — that cap is one filter on the degree join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import EDGES_CTE, derive_edges
from flink_streaming_gnn_spark.plans.hints import maybe_broadcast

TOP_N = 200


def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derive_edges(spark, sf_dir).select("src", "dst").distinct()
    deg = e.groupBy("dst").agg(F.count("*").cast("long").alias("deg"))
    e2 = e.select(F.col("src").alias("src2"), F.col("dst").alias("b"))
    pairs = (
        e.join(e2, (e.src == e2.src2) & (e.dst < e2.b))
        .groupBy(F.col("dst").alias("a"), "b")
        .agg(F.count("*").cast("long").alias("common"))
    )
    deg_a = maybe_broadcast(deg.select(F.col("dst").alias("a"), F.col("deg").alias("deg_a")))
    deg_b = maybe_broadcast(deg.select(F.col("dst").alias("b"), F.col("deg").alias("deg_b")))
    scored = (
        pairs.join(deg_a, "a")
        .join(deg_b, "b")
        .select(
            "a",
            "b",
            "common",
            "deg_a",
            "deg_b",
            F.round(
                F.col("common") / (F.col("deg_a") + F.col("deg_b") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(F.col("jaccard").desc(), "a", "b").limit(TOP_N)


def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link-prediction score for supplier pairs:
    AA(a,b) = Σ_{c ∈ N(a)∩N(b)} 1/ln(deg(c)) — common neighbors weighted
    inversely by how promiscuous they are (a customer who buys from
    everyone carries no signal; the log-degree discount is the classical
    fix, Adamic & Adar 2003).

    Same wedge-join shape as graph_common_neighbors, with the shared
    customer's degree joined in broadcast-gated BEFORE the wedge
    aggregation so the weight rides the existing shuffle. Contributing
    wedge centers always have deg ≥ 2 (they touch both a and b), so
    1/ln(deg) is finite by construction."""
    e = derive_edges(spark, sf_dir).select("src", "dst").distinct()
    cdeg = e.groupBy("src").agg(F.count("*").cast("long").alias("cdeg"))
    e1 = e.join(maybe_broadcast(cdeg), "src")
    e2 = e.select(F.col("src").alias("src2"), F.col("dst").alias("b"))
    pairs = (
        e1.join(e2, (e1.src == e2.src2) & (e1.dst < e2.b))
        .groupBy(F.col("dst").alias("a"), "b")
        .agg(
            F.count("*").cast("long").alias("common"),
            F.round(F.sum(F.lit(1.0) / F.log(F.col("cdeg").cast("double"))), 6).alias("aa"),
        )
    )
    return pairs.orderBy(F.col("aa").desc(), "a", "b").limit(TOP_N)


QUERIES = {
    "graph_common_neighbors": graph_common_neighbors,
    "graph_adamic_adar": graph_adamic_adar,
}

ORACLE = {
    "graph_common_neighbors": f"""
        WITH {EDGES_CTE},
        de AS (SELECT DISTINCT src, dst FROM edges),
        deg AS (SELECT dst, CAST(count(*) AS BIGINT) AS deg FROM de GROUP BY dst),
        pairs AS (
            SELECT e1.dst AS a, e2.dst AS b, CAST(count(*) AS BIGINT) AS common
            FROM de e1 JOIN de e2 ON e1.src = e2.src AND e1.dst < e2.dst
            GROUP BY e1.dst, e2.dst
        )
        SELECT p.a, p.b, p.common,
               da.deg AS deg_a, db.deg AS deg_b,
               round(p.common / CAST(da.deg + db.deg - p.common AS DOUBLE), 6)
                   AS jaccard
        FROM pairs p
        JOIN deg da ON da.dst = p.a
        JOIN deg db ON db.dst = p.b
        ORDER BY jaccard DESC, p.a, p.b
        LIMIT {TOP_N}
    """,
    "graph_adamic_adar": f"""
        WITH {EDGES_CTE},
        de AS (SELECT DISTINCT src, dst FROM edges),
        cdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS cdeg FROM de GROUP BY src)
        SELECT e1.dst AS a, e2.dst AS b,
               CAST(count(*) AS BIGINT) AS common,
               round(sum(1.0 / ln(CAST(c.cdeg AS DOUBLE))), 6) AS aa
        FROM de e1
        JOIN de e2 ON e1.src = e2.src AND e1.dst < e2.dst
        JOIN cdeg c ON c.src = e1.src
        GROUP BY e1.dst, e2.dst
        ORDER BY aa DESC, a, b
        LIMIT {TOP_N}
    """,
}
