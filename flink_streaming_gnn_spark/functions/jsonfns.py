"""JSON function family (SURVEY.md §2B fn_json) over ``events.props``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_streaming_gnn_spark.sources.tables import load_table

_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_path"),
        F.from_json("props", _PROPS_SCHEMA).getField("k").cast("long").alias("k_typed"),
        (F.get_json_object("props", "$.k").cast("long") % 10).cast("long").alias("k_mod10"),
        F.get_json_object("props", "$.missing").alias("missing_key"),
    )


QUERIES = {"fn_json": fn_json}

ORACLE = {
    "fn_json": """
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k_path,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
               CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT) AS k_mod10,
               CAST(json_extract(props, '$.missing') AS VARCHAR) AS missing_key
        FROM events
    """,
}
