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


CMS_EPS = 0.001  # relative error bound vs total count
CMS_CONF = 0.99
CMS_SEED = 42
CMS_PROBES = tuple(range(1, 11))  # fixed probe user_ids (exist at every sf)


def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count–min sketch frequency estimation (Cormode–Muthukrishnan 2005)
    per event type + OR-merged rollup — the point-frequency twin of the
    HLL distinct tier: mergeable O(1/eps · log 1/δ) state per group, so
    per-partition sketches roll up to any grain without re-reading raw
    data. The sketch agg is map-side combinable; only |types| blobs
    shuffle. The probe readout deserializes the BOUNDED blob set
    driver-side (|types|+1 sketches × |probes| lookups — summary-sized by
    construction, like the PageRank top-100 readout).

    Rows-only: DuckDB has no CMS twin; the one-sided error guarantee
    (estimate ≥ true count; ≤ true + eps·N w.p. ≥ conf) is pinned in
    tests/test_round3.py."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sk = ev.groupBy("event_type").agg(
        F.expr(
            f"count_min_sketch(user_id, {CMS_EPS}d, {CMS_CONF}d, {CMS_SEED})"
        ).alias("sk")
    )
    rows = sk.collect()  # |event_types| blobs — bounded sketch state
    jvm = spark.sparkContext._jvm
    CountMinSketch = jvm.org.apache.spark.util.sketch.CountMinSketch

    def _read(blob: bytes):
        return CountMinSketch.readFrom(jvm.java.io.ByteArrayInputStream(bytes(blob)))

    sketches = {r["event_type"]: _read(r["sk"]) for r in rows}
    merged = None
    for cms in sketches.values():
        if merged is None:
            merged = _read(rows[0]["sk"])  # fresh copy to merge into
            continue
        merged.mergeInPlace(cms)
    out = []
    for et, cms in sorted(sketches.items()):
        for p in CMS_PROBES:
            out.append((et, p, cms.estimateCount(jvm.java.lang.Long(p))))
    if merged is not None:
        for p in CMS_PROBES:
            out.append(("ALL", p, merged.estimateCount(jvm.java.lang.Long(p))))
    return spark.createDataFrame(
        out, schema="event_type string, probe_user long, est_count long"
    )


QUERIES = {
    "agg_hll_sketch_rollup": agg_hll_sketch_rollup,
    "agg_count_min_sketch": agg_count_min_sketch,
}
# no ORACLE: DataSketches HLL / CMS have no DuckDB twin — rows-only by
# design, error bounds pinned in tests/test_new_ops.py + tests/test_round3.py
ORACLE: dict[str, str] = {}
