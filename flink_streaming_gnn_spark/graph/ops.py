"""Graph operators: degree, 1-hop / 2-hop neighbor aggregation, partition
assignment (SURVEY.md §2B "GNN / graph-specific"; reference §2A A4-A6).

Scale design — the 2-hop operator is the one where algorithm choice matters
(BASELINE.md: the naive edge self-join took 10.9 s in DuckDB at sf0.1 and is
quadratic in vertex degree — at 100 TB a hot supplier would explode).
We pre-aggregate per intermediate vertex first, turning
O(Σ deg²) into O(E): two hash aggregations + one broadcast-able join,
never materializing vertex-pair paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import EDGES_CTE, derive_edges
from flink_streaming_gnn_spark.plans.hints import maybe_broadcast
from flink_streaming_gnn_spark.sources.tables import load_table


def graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-degree / distinct-neighbor count / weighted degree per dst vertex."""
    e = derive_edges(spark, sf_dir)
    return e.groupBy(F.col("dst").alias("vertex")).agg(
        F.count("*").cast("long").alias("in_degree"),
        F.countDistinct("src").cast("long").alias("n_neighbors"),
        F.round(F.sum("w"), 2).alias("weighted_degree"),
    )


def graph_1hop_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hop neighbor feature aggregation (reference A6/A7): per supplier,
    mean/max and edge-weighted mean of in-neighbor customer balances."""
    e = derive_edges(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    return (
        e.join(maybe_broadcast(c), e.src == c.c_custkey)
        .groupBy(F.col("dst").alias("vertex"))
        .agg(
            F.round(F.avg("c_acctbal"), 4).alias("nbr_mean"),
            F.max("c_acctbal").alias("nbr_max"),
            F.round(F.sum(F.col("c_acctbal") * F.col("w")) / F.sum("w"), 4).alias(
                "nbr_wmean"
            ),
        )
    )


def graph_2hop_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop neighbor aggregation (2-layer GNN receptive field), counted
    over paths a→b←c (shared supplier b, path multiplicity, self-paths
    included): per customer a, mean acctbal over all such c.

    Pre-aggregation identity: with s_b = Σ_c feat(c), n_b = |edges into b|,
        mean_a = (Σ_{e:a→b} s_b) / (Σ_{e:a→b} n_b)
    — two hash aggs + one join on b, O(E) instead of the O(Σ deg²)
    edge self-join (10.9 s in the DuckDB baseline, unviable at 100 TB).
    """
    e = derive_edges(spark, sf_dir).select("src", "dst")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    per_b = (
        e.join(maybe_broadcast(c), e.src == c.c_custkey)
        .groupBy("dst")
        .agg(F.sum("c_acctbal").alias("s_b"), F.count("*").alias("n_b"))
    )
    # per_b is one row per distinct dst — bounded by the supplier key
    # domain (dst = l_suppkey), which the optimizer cannot see: its own
    # estimate for the aggregate is join-multiplied garbage (~97 PB at
    # sf0.1 for 1000 actual rows), so it plans a sort-merge join and
    # shuffles the ENTIRE edge side by dst. Gating the broadcast on the
    # supplier table's accurate footer estimate removes that exchange
    # and both sorts (guide §2.4/§3.1/§8); past the 128 MB domain gate
    # the hint is withheld and the SMJ fallback returns.
    per_b = maybe_broadcast(
        per_b, size_of=load_table(spark, sf_dir, "supplier").select("s_suppkey")
    )
    return (
        e.join(per_b, "dst")
        .groupBy(F.col("src").alias("vertex"))
        .agg(
            (F.sum("s_b") / F.sum("n_b")).alias("two_hop_mean"),
            F.sum("n_b").cast("long").alias("n_paths"),
        )
        .select("vertex", F.round("two_hop_mean", 4).alias("two_hop_mean"), "n_paths")
    )


def graph_partition_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic vertex→partition assignment (reference A4 HDRF
    stand-in, SURVEY.md §2A: hash partitioning replaces streaming
    vertex-cut under Spark's shuffle model). Uses id % n (not an engine
    hash) so the oracle twin is engine-independent."""
    n_parts = 8
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("vertex"), F.lit("customer").alias("vtype")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("vertex"), F.lit("supplier").alias("vtype")
    )
    v = c.unionByName(s)
    return v.select(
        "vertex", "vtype", F.pmod("vertex", F.lit(n_parts)).cast("long").alias("part_id")
    )


def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """log2-bucketed degree histogram — the power-law diagnostic read
    before choosing a partitioner (HDRF's whole premise is a skewed
    degree distribution; this is the query that shows it). Two hash aggs:
    per-vertex distinct-neighbor degree, then a bucket rollup whose key
    count is log-bounded (≤64 buckets at any scale).

    The bucket is floor(log2(degree)) computed EXACTLY as
    ``length(bin(degree)) - 1`` — integer bit-length arithmetic, because
    float log2 differs between engines at exact powers of two (Spark's
    log2 is log(x)/log(2), which can land at 2.9999… where libm's log2
    returns 3.0)."""
    e = derive_edges(spark, sf_dir)
    deg = e.groupBy("dst").agg(F.countDistinct("src").alias("deg"))
    return (
        deg.withColumn(
            "bucket", (F.length(F.bin(F.col("deg"))) - 1).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_vertices"),
            F.min("deg").cast("long").alias("min_deg"),
            F.max("deg").cast("long").alias("max_deg"),
        )
    )


QUERIES = {
    "graph_degree": graph_degree,
    "graph_degree_distribution": graph_degree_distribution,
    "graph_1hop_agg": graph_1hop_agg,
    "graph_2hop_agg": graph_2hop_agg,
    "graph_2hop_neighbor_agg": graph_2hop_agg,  # BASELINE.md headline name
    "graph_partition_assign": graph_partition_assign,
}

_TWO_HOP_SQL = f"""
    WITH {EDGES_CTE},
    per_b AS (
        SELECT dst, sum(c_acctbal) AS s_b, count(*) AS n_b
        FROM edges JOIN customer ON src = c_custkey
        GROUP BY dst
    )
    SELECT e.src AS vertex,
           round(sum(p.s_b) / sum(p.n_b), 4) AS two_hop_mean,
           CAST(sum(p.n_b) AS BIGINT) AS n_paths
    FROM edges e JOIN per_b p ON e.dst = p.dst
    GROUP BY e.src
"""

ORACLE = {
    "graph_degree_distribution": f"""
        WITH {EDGES_CTE},
        deg AS (
            SELECT dst, count(DISTINCT src) AS deg FROM edges GROUP BY dst
        )
        SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_vertices,
               CAST(min(deg) AS BIGINT) AS min_deg,
               CAST(max(deg) AS BIGINT) AS max_deg
        FROM deg GROUP BY length(bin(deg)) - 1
    """,
    "graph_degree": f"""
        WITH {EDGES_CTE}
        SELECT dst AS vertex,
               CAST(count(*) AS BIGINT) AS in_degree,
               CAST(count(DISTINCT src) AS BIGINT) AS n_neighbors,
               round(sum(w), 2) AS weighted_degree
        FROM edges
        GROUP BY dst
    """,
    "graph_1hop_agg": f"""
        WITH {EDGES_CTE}
        SELECT dst AS vertex,
               round(avg(c_acctbal), 4) AS nbr_mean,
               max(c_acctbal) AS nbr_max,
               round(sum(c_acctbal * w) / sum(w), 4) AS nbr_wmean
        FROM edges JOIN customer ON src = c_custkey
        GROUP BY dst
    """,
    "graph_2hop_agg": _TWO_HOP_SQL,
    "graph_2hop_neighbor_agg": _TWO_HOP_SQL,
    "graph_partition_assign": """
        SELECT vertex, vtype, CAST(vertex % 8 AS BIGINT) AS part_id
        FROM (
            SELECT c_custkey AS vertex, 'customer' AS vtype FROM customer
            UNION ALL
            SELECT s_suppkey AS vertex, 'supplier' AS vtype FROM supplier
        )
    """,
}
