"""Directed-graph reciprocity and bipartite projection (SURVEY.md §2B
graph tier — structural metrics the reference's GraphOp stream feeds into
downstream analytics; both are one-pass relational plans, no iteration).

``graph_reciprocity``: per-vertex out/in degree and the count of
reciprocated out-edges on the DIRECTED vertex-fixture graph (the same
pmod-500 id space ``graph/scc.py`` uses — the only derived graph here
with meaningful two-way edges). Reciprocity is THE quick structural
probe of a directed graph (citation nets ≈ 0, social follows ≈ 0.5+);
computed as one distinct edge set, one self-join on swapped keys
(left-semi marks a reverse edge), two degree aggregates. Every join/agg
shuffles on a vertex id — at 100 TB each is a plain hash exchange on the
edge key space, no skew beyond the graph's own degree skew (AQE handles
that), no driver reads.

``graph_bipartite_projection``: project the customer→supplier bipartite
graph onto customers — (a, b) customer pairs weighted by the number of
shared strong suppliers. The classic co-occurrence/collaborative-
filtering build. The naive projection is Σ_s deg(s)² pairs — quadratic
in supplier degree, and in this corpus EVERY supplier is a hub (~480
distinct customers at sf0.01, growing with sf), so degree must be
bounded before the self-join. The standard discipline (item-item CF's
"top-k items per user") is implemented here: keep only each customer's
TOP_SUPPLIERS strongest suppliers by spend, which pins supplier degree
at ≈ TOP_SUPPLIERS·|C|/|S| — a constant under TPC-H's fixed
customer:supplier ratio — so the projection cost grows linearly with
the corpus, never quadratically. Output is the global top pairs under
a total order, so the result is deterministic and small at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import (
    EDGES_CTE,
    EDGES_V_CTE,
    derive_edges,
    derive_vertex_embeddings,
)

TOP_SUPPLIERS = 3  # strongest suppliers kept per customer (degree bound)
TOP_PAIRS = 200


def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex: out_deg, in_deg, n_recip (out-edges whose reverse edge
    exists), recip_ratio — over the distinct directed pmod-500 graph,
    self-loops excluded (standard reciprocity convention)."""
    e = (
        derive_vertex_embeddings(spark, sf_dir)
        .select(F.col("src_v").alias("s"), F.col("dst_v").alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint()  # referenced three times below — scan once
    )
    rev = e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    recip = (
        e.join(rev, ["s", "d"], "left_semi")
        .groupBy("s")
        .agg(F.count("*").cast("long").alias("n_recip"))
    )
    out_deg = e.groupBy("s").agg(F.count("*").cast("long").alias("out_deg"))
    in_deg = (
        e.groupBy("d")
        .agg(F.count("*").cast("long").alias("in_deg"))
        .withColumnRenamed("d", "s")
    )
    return (
        out_deg.join(in_deg, "s", "full")
        .join(recip, "s", "left")
        .select(
            F.col("s").cast("long").alias("v"),
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
            F.coalesce("n_recip", F.lit(0)).cast("long").alias("n_recip"),
            F.round(
                F.coalesce("n_recip", F.lit(0))
                / F.greatest(F.coalesce("out_deg", F.lit(0)), F.lit(1)),
                6,
            ).alias("recip_ratio"),
        )
        .orderBy("v")
    )


def graph_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer–customer projection of the bipartite purchase graph:
    top-200 pairs by shared-strong-supplier count, where "strong" keeps
    each customer's TOP_SUPPLIERS suppliers by total spend (the degree
    bound that keeps the self-join linear at scale)."""
    spend = (
        derive_edges(spark, sf_dir)
        .groupBy(F.col("src").alias("c"), F.col("dst").alias("sp"))
        .agg(F.round(F.sum("w"), 2).alias("spend"))
    )
    w_cust = Window.partitionBy("c").orderBy(F.col("spend").desc(), "sp")
    # NOT checkpointed: both self-join sides declare the same sub-plan, so
    # AQE exchange reuse dedupes the scan at runtime — and the declared
    # plan keeps the rank filter visible to Catalyst, which compiles it to
    # WindowGroupLimit (partial top-k per task BEFORE the exchange; plan-
    # audited). A checkpoint here would hide that pushdown from the plan.
    slim = (
        spend.withColumn("rn", F.row_number().over(w_cust))
        .filter(F.col("rn") <= TOP_SUPPLIERS)
        .select("c", "sp")
    )
    a = slim.select(F.col("sp"), F.col("c").alias("a"))
    b = slim.select(F.col("sp"), F.col("c").alias("b"))
    return (
        a.join(b, "sp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .orderBy(F.col("n_shared").desc(), "a", "b")
        .limit(TOP_PAIRS)
        .select(
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            "n_shared",
        )
    )


QUERIES = {
    "graph_reciprocity": graph_reciprocity,
    "graph_bipartite_projection": graph_bipartite_projection,
}

ORACLE = {
    "graph_reciprocity": f"""
        WITH {EDGES_V_CTE},
        de AS (
            SELECT DISTINCT src_v AS s, dst_v AS d FROM edges_v
            WHERE src_v <> dst_v
        ),
        recip AS (
            SELECT e.s, CAST(count(*) AS BIGINT) AS n_recip
            FROM de e
            WHERE EXISTS (SELECT 1 FROM de r WHERE r.s = e.d AND r.d = e.s)
            GROUP BY e.s
        ),
        outd AS (SELECT s, CAST(count(*) AS BIGINT) AS out_deg FROM de GROUP BY s),
        ind AS (SELECT d AS s, CAST(count(*) AS BIGINT) AS in_deg FROM de GROUP BY d)
        SELECT CAST(COALESCE(outd.s, ind.s) AS BIGINT) AS v,
               COALESCE(out_deg, 0) AS out_deg,
               COALESCE(in_deg, 0) AS in_deg,
               COALESCE(n_recip, 0) AS n_recip,
               round(COALESCE(n_recip, 0)
                     / greatest(COALESCE(out_deg, 0), 1), 6) AS recip_ratio
        FROM outd
        FULL OUTER JOIN ind ON outd.s = ind.s
        LEFT JOIN recip ON COALESCE(outd.s, ind.s) = recip.s
        ORDER BY v
    """,
    "graph_bipartite_projection": f"""
        WITH {EDGES_CTE},
        spend AS (
            SELECT src AS c, dst AS sp, round(sum(w), 2) AS spend
            FROM edges GROUP BY src, dst
        ),
        slim AS (
            SELECT c, sp FROM (
                SELECT c, sp,
                       row_number() OVER (
                           PARTITION BY c ORDER BY spend DESC, sp
                       ) AS rn
                FROM spend
            ) WHERE rn <= {TOP_SUPPLIERS}
        )
        SELECT CAST(x.c AS BIGINT) AS a, CAST(y.c AS BIGINT) AS b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM slim x JOIN slim y ON x.sp = y.sp AND x.c < y.c
        GROUP BY x.c, y.c
        ORDER BY n_shared DESC, a, b
        LIMIT {TOP_PAIRS}
    """,
}
