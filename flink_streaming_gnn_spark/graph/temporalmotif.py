"""Time-respecting temporal-motif counting (Paranjape, Benson &
Leskovec, "Motifs in Temporal Networks", WSDM 2017): the δ-temporal
WEDGE — two customers hitting the same supplier in sequence
(c1→s at t1, then c2→s at t2 with t1 < t2 ≤ t1 + δ, c1 ≠ c2) — the
smallest ordered motif of the bipartite purchase stream and the
building block of burst/cascade detection on temporal graphs.

Spark-first shape: the motif join is an EQUI-join on
(supplier, day-bucket) with the partner probing its own and the next
δ-sized bucket (``join_band_epsilon``'s banding discipline — a
time-respecting pair within δ=7 days spans at most two 7-day buckets,
so the band condition prunes to a cell-local filter and the fan-out is
per-cell-degree², never per-supplier-degree²). Edges are collapsed to
distinct (customer, supplier, day) first — multigraph repeats would
quadratically inflate the motif count without adding structure.

Integer-exact: day arithmetic on epoch-day ints; counts are longs; no
float appears anywhere, so the oracle (which joins WITHOUT banding —
a cross-formulation proof that banding loses nothing) hash-matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import EDGES_CTE, derive_edges

DELTA_DAYS = 7
TOP_N = 100


def graph_temporal_wedge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier δ-temporal wedge census: (s, n_wedges,
    n_ordered_pairs), top TOP_N by count with deterministic tie-break."""
    e = (
        derive_edges(spark, sf_dir)
        .select("src", "dst", F.unix_date(F.col("ts").cast("date")).alias("d"))
        .distinct()  # (customer, supplier, day) grain
    )
    e = e.withColumn("bucket", F.floor(F.col("d") / DELTA_DAYS))
    # the earlier edge probes its own bucket and the next one
    lhs = e.select(
        F.col("dst").alias("s"),
        F.col("src").alias("c1"),
        F.col("d").alias("d1"),
        F.explode(
            F.array(F.col("bucket"), F.col("bucket") + 1)
        ).alias("bucket"),
    )
    rhs = e.select(
        F.col("dst").alias("s"),
        F.col("src").alias("c2"),
        F.col("d").alias("d2"),
        "bucket",
    )
    wedges = lhs.join(rhs, ["s", "bucket"]).filter(
        (F.col("d2") > F.col("d1"))
        & (F.col("d2") <= F.col("d1") + DELTA_DAYS)
        & (F.col("c1") != F.col("c2"))
    )
    return (
        wedges.groupBy("s")
        .agg(
            F.count("*").cast("long").alias("n_wedges"),
            F.countDistinct("c1", "c2").cast("long").alias("n_ordered_pairs"),
        )
        .orderBy(F.col("n_wedges").desc(), "s")
        .limit(TOP_N)
    )


QUERIES = {"graph_temporal_wedge": graph_temporal_wedge}

ORACLE = {
    # un-banded formulation: the direct theta-band join proves the
    # bucketed equi-join drops nothing
    "graph_temporal_wedge": f"""
        WITH {EDGES_CTE},
        de AS (
            SELECT DISTINCT src, dst,
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
            FROM edges
        )
        SELECT a.dst AS s,
               CAST(count(*) AS BIGINT) AS n_wedges,
               CAST(count(DISTINCT (a.src, b.src)) AS BIGINT)
                   AS n_ordered_pairs
        FROM de a
        JOIN de b ON b.dst = a.dst
                 AND b.d > a.d AND b.d <= a.d + {DELTA_DAYS}
                 AND b.src <> a.src
        GROUP BY a.dst
        ORDER BY n_wedges DESC, s
        LIMIT {TOP_N}
    """,
}
