"""GraphOp mutation-stream model — the reference's fundamental abstraction
(SURVEY.md §1.1: every record flowing between operators is a
``GraphOp { op ∈ ADD/UPDATE/REMOVE/…, element, timestamp }``; the stream of
GraphOps *is* the graph — there is no table of record).

Spark-first translation: a GraphOp stream is a DataFrame of typed mutation
rows; the "current graph" is a *derived view* — last-writer-wins
materialization by event time — rather than mutable operator state. That
inversion (state = a query over the log, not the log applied to state) is
what makes the model scale: materialization is one ranking window or one
max_by aggregate, both shuffle-once on the vertex key, and the same plan
runs incrementally under Structured Streaming (streaming/stateful.py
``latest_state`` is the stateful twin; batch≡stream pinned in tests).

The fixture op stream is derived deterministically from ``events``
(reference A2 parser: raw record → GraphOp): signup=ADD, error=REMOVE,
click/view/purchase=UPDATE of the vertex's ``value`` feature; ``props``
JSON is parsed into a feature column on the way in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

OP_CASE = (
    "CASE event_type WHEN 'signup' THEN 'ADD' WHEN 'error' THEN 'REMOVE' "
    "ELSE 'UPDATE' END"
)


def graphop_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse raw event records into GraphOps (reference A2): op kind, vertex
    element id, feature payload (value + parsed JSON prop), event time,
    and a total-order sequence number for deterministic replay."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("seq"),
        F.expr(OP_CASE).alias("op"),
        F.col("user_id").alias("vertex"),
        F.col("value").alias("feat_value"),
        F.get_json_object("props", "$.k").cast("long").alias("feat_k"),
        "ts",
    )


def graphop_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current graph state from the op log: per vertex, the latest op wins;
    a vertex whose latest op is REMOVE is dead. "Latest" = highest seq —
    the log's total order (events.ts is ns-precision in the fixture and
    µs-truncated by Spark's reader, so ranking by timestamp would tie-break
    differently across engines; seq is unambiguous in both).

    One ranking window, one shuffle on the vertex key; under streaming the
    identical semantics run as keyed state (latest_state). At 100 TB the
    log is partitioned by vertex and the window never re-sorts more than
    one vertex's ops per task.
    """
    ops = graphop_stream(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("vertex").orderBy(F.col("seq").desc())
    return (
        ops.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "REMOVE"))
        .select(
            "vertex",
            "op",
            F.round("feat_value", 4).alias("feat_value"),
            "feat_k",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("state_ts"),
        )
    )


def graphop_op_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op-kind mix per vertex — the log-compaction planning view (how much
    of the log is dead weight per key)."""
    ops = graphop_stream(spark, sf_dir)
    return ops.groupBy("vertex").agg(
        F.count("*").cast("long").alias("n_ops"),
        F.sum((F.col("op") == "ADD").cast("long")).cast("long").alias("n_add"),
        F.sum((F.col("op") == "UPDATE").cast("long")).cast("long").alias("n_update"),
        F.sum((F.col("op") == "REMOVE").cast("long")).cast("long").alias("n_remove"),
        F.round(F.sum(F.when(F.col("op") != "REMOVE", F.col("feat_value"))), 4).alias(
            "sum_live_value"
        ),
    )


QUERIES = {
    "graphop_materialize": graphop_materialize,
    "graphop_op_counts": graphop_op_counts,
}

ORACLE = {
    "graphop_materialize": f"""
        WITH ops AS (
            SELECT event_id AS seq, {OP_CASE} AS op, user_id AS vertex,
                   value AS feat_value,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS feat_k,
                   ts
            FROM events
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY vertex
                                         ORDER BY seq DESC) AS rn
            FROM ops
        )
        SELECT vertex, op, round(feat_value, 4) AS feat_value, feat_k,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS state_ts
        FROM ranked WHERE rn = 1 AND op <> 'REMOVE'
    """,
    "graphop_op_counts": f"""
        WITH ops AS (
            SELECT {OP_CASE} AS op, user_id AS vertex, value AS feat_value
            FROM events
        )
        SELECT vertex,
               CAST(count(*) AS BIGINT) AS n_ops,
               CAST(sum(CASE WHEN op = 'ADD' THEN 1 ELSE 0 END) AS BIGINT) AS n_add,
               CAST(sum(CASE WHEN op = 'UPDATE' THEN 1 ELSE 0 END) AS BIGINT) AS n_update,
               CAST(sum(CASE WHEN op = 'REMOVE' THEN 1 ELSE 0 END) AS BIGINT) AS n_remove,
               round(sum(CASE WHEN op <> 'REMOVE' THEN feat_value END), 4) AS sum_live_value
        FROM ops
        GROUP BY vertex
    """,
}
