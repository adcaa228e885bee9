"""Degree assortativity (Newman 2002) — does the graph wire hubs to hubs?
The one-number structural statistic next to the centrality family
(SURVEY.md §2B graph ops): the Pearson correlation between the
out-degree of an edge's source and the in-degree of its destination,
over all distinct edges.

Spark-first: two degree aggregates (|V|-sized, broadcast-gated) joined
onto the edge list, then ONE corr() aggregate — the correlation is a
moment aggregate, so the whole statistic is mergeable map-side partials;
no collect, no iteration.

At 100 TB: same cost envelope as graph_degree plus one scalar aggregate;
the degree joins reuse the vertex-id shuffle every other graph operator
already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import EDGES_CTE, derive_edges
from flink_streaming_gnn_spark.plans.hints import maybe_broadcast


def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derive_edges(spark, sf_dir).select("src", "dst").distinct()
    dout = e.groupBy("src").agg(F.count("*").cast("double").alias("dout"))
    din = e.groupBy("dst").agg(F.count("*").cast("double").alias("din"))
    joined = e.join(maybe_broadcast(dout), "src").join(maybe_broadcast(din), "dst")
    return joined.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.round(F.corr("dout", "din"), 6).alias("assortativity"),
        F.round(F.avg("dout"), 4).alias("mean_src_outdeg"),
        F.round(F.avg("din"), 4).alias("mean_dst_indeg"),
    )


QUERIES = {"graph_assortativity": graph_assortativity}

ORACLE = {
    "graph_assortativity": f"""
        WITH {EDGES_CTE},
        de AS (SELECT DISTINCT src, dst FROM edges),
        dout AS (
            SELECT src, CAST(count(*) AS DOUBLE) AS dout FROM de GROUP BY src
        ),
        din AS (
            SELECT dst, CAST(count(*) AS DOUBLE) AS din FROM de GROUP BY dst
        )
        SELECT CAST(count(*) AS BIGINT) AS n_edges,
               round(corr(dout, din), 6) AS assortativity,
               round(avg(dout), 4) AS mean_src_outdeg,
               round(avg(din), 4) AS mean_dst_indeg
        FROM de JOIN dout USING (src) JOIN din USING (dst)
    """,
}
