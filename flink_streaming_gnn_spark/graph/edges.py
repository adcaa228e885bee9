"""Edge derivation (FIXTURES.md "Graph derivation"): the corpus has no
native edge table, so the graph fixtures derive a bipartite
customer→supplier multigraph from the star schema:

    edges(src=o_custkey, dst=l_suppkey, w=l_extendedprice, ts=l_shipdate)
    via lineitem ⋈ orders ON l_orderkey = o_orderkey

This mirrors the reference's edge-stream ingestion (SURVEY.md §2A A1/A2):
each lineitem row is one edge event with a weight and an event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

# vertex-id space used for tensor fixtures: embeddings keyed by pmod(id, 500)
EMB_MOD = 500


def derive_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite customer→supplier multigraph (one edge per lineitem).

    One shuffle (lineitem ⋈ orders on orderkey); at cluster scale both
    sides would be bucketed on orderkey to make this co-located.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("src"),
        F.col("l_suppkey").alias("dst"),
        F.col("l_extendedprice").alias("w"),
        F.col("l_shipdate").alias("ts"),
    )


# DuckDB CTE twin of derive_edges, reused by the graph oracle queries
EDGES_CTE = """
    edges AS (
        SELECT o_custkey AS src, l_suppkey AS dst,
               l_extendedprice AS w, l_shipdate AS ts
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
"""


def derive_vertex_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tensor-fixture edge list in embedding-id space: both endpoints mapped
    by pmod(id, 500) onto embeddings.vec_id (FIXTURES.md)."""
    return derive_edges(spark, sf_dir).select(
        F.pmod("src", F.lit(EMB_MOD)).cast("long").alias("src_v"),
        F.pmod("dst", F.lit(EMB_MOD)).cast("long").alias("dst_v"),
    )


EDGES_V_CTE = f"""
    edges_v AS (
        SELECT o_custkey % {EMB_MOD} AS src_v, l_suppkey % {EMB_MOD} AS dst_v
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
"""
