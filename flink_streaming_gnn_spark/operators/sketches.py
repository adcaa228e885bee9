"""Mergeable-sketch aggregation (Apache DataSketches HLL via Spark's
``hll_sketch_agg``/``hll_union_agg`` — SURVEY.md §2B aggregations, the
production form of ``agg_approx_distinct``).

``agg_hll_sketch_rollup``: per-event-type HLL sketch of the user set,
estimated per type AND union-merged into an all-types estimate — in one
plan. The union step is the 100 TB story: sketches are small mergeable
state, so daily/partition-level sketches roll up to any grain without
re-reading raw data (the same pre-aggregation discipline as the 2-hop
rewrite, applied to distinct counting). The per-type sketch agg is
map-side combinable; the union agg merges |types| sketch blobs.

HLL register state is insertion-order-independent (register = max of
hashes), so the estimates are deterministic for a given dataset — but
DuckDB has no DataSketches twin, so the key is rows-only with the error
bound and the union-vs-exact invariants pinned in
tests/test_new_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table


def agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").cast("long").alias("exact_users"),
    )
    per_type = sk.select(
        "event_type",
        F.hll_sketch_estimate("sk").cast("long").alias("est_users"),
        "exact_users",
    )
    merged = sk.agg(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est_users"),
        F.lit(None).cast("long").alias("exact_users"),
    )
    return per_type.unionByName(merged)


QUERIES = {"agg_hll_sketch_rollup": agg_hll_sketch_rollup}
# no ORACLE: DataSketches HLL has no DuckDB twin — rows-only by design,
# error bounds pinned in tests/test_new_ops.py
ORACLE: dict[str, str] = {}
