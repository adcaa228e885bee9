"""Map function family (SURVEY.md §2B fn_map).

Builds a per-user map of event_type → count with ``map_from_entries`` and
reads it back with map accessors. The oracle twin is relational (FILTER'd
counts) — it checks the map path computes the right *values* without
shipping a map across the engine boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table


def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counted = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    mapped = counted.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("type_counts")
    )
    return mapped.select(
        "user_id",
        F.element_at("type_counts", "click").cast("long").alias("n_clicks"),
        F.element_at("type_counts", "purchase").cast("long").alias("n_purchases"),
        F.size("type_counts").cast("long").alias("n_types"),
        F.array_join(F.map_keys("type_counts"), ",").alias("types_csv"),
        F.expr(
            "CAST(aggregate(map_values(type_counts), 0L, (acc, v) -> acc + v) AS BIGINT)"
        ).alias("n_events"),
    )


QUERIES = {"fn_map": fn_map}

ORACLE = {
    "fn_map": """
        SELECT user_id,
               nullif(CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT), 0)
                   AS n_clicks,
               nullif(CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT), 0)
                   AS n_purchases,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
               string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY user_id
    """,
}
