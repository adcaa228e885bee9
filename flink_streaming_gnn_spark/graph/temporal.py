"""Temporal graph operators (SURVEY.md §2A A1/A8: the reference ingests a
*timestamped* edge stream and aggregates neighbors inside event-time
windows; these keys expose the two batch views a temporal/streaming GNN
needs next to the windowed forward in ``streaming/gnn.py``):

* ``graph_temporal_degree`` — per-month degree snapshots: how a vertex's
  connectivity evolves over event time (the "graph at time t" view a
  temporal-GNN trainer samples from).
* ``graph_time_decayed_agg`` — TGN-style exponentially time-decayed
  neighbor aggregation: recent edges dominate, old ones fade with a 90-day
  half-life-ish constant. This is the batch twin of an incremental decayed
  aggregator (the streaming form folds ``state*exp(-Δt/τ) + w`` per event
  in keyed state, same math).

Spark-first shape: both are one hash aggregate over the derived edge
stream — the month key or the decay weight is a JVM scalar expression
riding the existing shuffle on dst; no Python, no extra exchange. The
reference timestamp for the decay is the corpus max(ts), joined in as a
broadcast 1-row aggregate (no driver collect in the data path).

At 100 TB: per-(month, vertex) cardinality is bounded by |V|×months — the
partial aggregation absorbs hot vertices; the decay aggregate is a plain
mergeable sum, so map-side combine applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import EDGES_CTE, derive_edges

TAU_DAYS = 90.0  # decay time constant


def graph_temporal_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(month, vertex) snapshot degree over the timestamped edge
    stream: distinct in-neighbors and raw edge-event count."""
    e = derive_edges(spark, sf_dir)
    return e.groupBy(
        F.date_trunc("month", F.col("ts")).alias("month"),
        F.col("dst").alias("vertex"),
    ).agg(
        F.countDistinct("src").cast("long").alias("n_neighbors"),
        F.count("*").cast("long").alias("n_edge_events"),
    )


def graph_time_decayed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed weighted degree: per vertex
    ``score = Σ_edges w · exp(-age_days / τ)`` with age measured back from
    the corpus max event time. One broadcast scalar + one hash agg."""
    e = derive_edges(spark, sf_dir)
    ref = e.agg(F.max(F.to_date("ts")).alias("ref_day"))
    aged = e.crossJoin(F.broadcast(ref)).select(
        "dst",
        "w",
        F.datediff(F.col("ref_day"), F.to_date("ts")).alias("age_days"),
    )
    return aged.groupBy(F.col("dst").alias("vertex")).agg(
        F.round(
            F.sum(F.col("w") * F.exp(-F.col("age_days") / F.lit(TAU_DAYS))), 2
        ).alias("decayed_score"),
        F.count("*").cast("long").alias("n_edges"),
    )


QUERIES = {
    "graph_temporal_degree": graph_temporal_degree,
    "graph_time_decayed_agg": graph_time_decayed_agg,
}

ORACLE = {
    "graph_temporal_degree": f"""
        WITH {EDGES_CTE}
        SELECT date_trunc('month', ts) AS month, dst AS vertex,
               CAST(count(DISTINCT src) AS BIGINT) AS n_neighbors,
               CAST(count(*) AS BIGINT) AS n_edge_events
        FROM edges
        GROUP BY 1, 2
    """,
    "graph_time_decayed_agg": f"""
        WITH {EDGES_CTE},
        ref AS (SELECT max(CAST(ts AS DATE)) AS ref_day FROM edges)
        SELECT dst AS vertex,
               round(sum(w * exp(-date_diff('day', CAST(ts AS DATE), ref.ref_day)
                                 / {TAU_DAYS})), 2) AS decayed_score,
               CAST(count(*) AS BIGINT) AS n_edges
        FROM edges CROSS JOIN ref
        GROUP BY dst
    """,
}
