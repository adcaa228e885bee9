"""Exact distinct counting via mergeable bitmaps (SURVEY.md §2B aggregate
family; Spark 4's ``bitmap_*`` function group).

``count(DISTINCT x)`` is the one classic aggregate that does NOT pre-
aggregate: the raw keys must reach one place. The two standard scale
escapes are HLL sketches (approximate — ``agg_hll_sketch_rollup``) and
this operator's exact path: pack each key into a fixed 4KB bitmap bucket
(``bitmap_bucket_number`` / ``bitmap_bit_position``), OR the bitmaps —
a commutative, map-side-combinable merge — and sum ``bitmap_count`` over
buckets. The shuffle carries at most one 4KB blob per (group, bucket)
regardless of row count, and the per-group bitmaps roll up to ANY coarser
grain by OR-merging, never re-reading raw data: the same
mergeable-pre-aggregation contract as the HLL tier, but exact.

The query materializes both grains from ONE inner bitmap pass: distinct
users per event type, plus the corpus-wide distinct ('__all__' row) merged
from the per-type bitmaps with ``bitmap_or_agg`` — the rollup that plain
distinct counts cannot do (distincts don't add).

Oracle: plain COUNT(DISTINCT) at both grains — the bitmap machinery must
reproduce the exact numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table


def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("buck")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    per_type = per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).cast("long").alias("n_distinct_users")
    )
    total = (
        per_bucket.groupBy("buck")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).cast("long").alias("n_distinct_users"))
        .select(F.lit("__all__").alias("event_type"), "n_distinct_users")
    )
    return per_type.unionByName(total)


QUERIES = {"agg_bitmap_distinct": agg_bitmap_distinct}

ORACLE = {
    "agg_bitmap_distinct": """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users
        FROM events GROUP BY event_type
        UNION ALL
        SELECT '__all__' AS event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users
        FROM events
    """,
}
