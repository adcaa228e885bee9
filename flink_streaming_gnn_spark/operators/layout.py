"""Data-layout operators for multi-dimensional pruning and inequality
joins at scale (SURVEY.md §2B scans/joins families).

``sink_zorder_layout``: Z-order (Morton-curve) clustering — THE layout
lever for multi-dimensional scan pruning at 100 TB (Delta/Iceberg
OPTIMIZE ZORDER): quantize two columns to 8 bits each against their
global bounds, interleave the bits into a 16-bit Morton code, range-
partition + sort the write on it, and report per-bucket min/max of both
dimensions. Because the curve keeps both dims locally contiguous, every
bucket covers a tight rectangle in (orderkey, partkey) space — a
predicate on EITHER column prunes most buckets by footer min/max alone,
which a single-column sort only delivers for its own column. The whole
op is integer arithmetic in whole-stage codegen; the only non-scan cost
is the range exchange the sink itself exists to pay. The oracle computes
the identical Morton arithmetic relationally, so the hash check covers
quantization, interleave, the written files, and the stats read-back.

``join_band_epsilon``: band join (|x − y| ≤ ε) as a bucketed equi-join —
the scalable rewrite of an inequality join: bucket every row at ε width,
explode the (tiny, density-bounded) probe side to its 3 adjacent
buckets, equi-join on bucket id, re-apply the exact band predicate. The
candidate set is the band's true neighborhood (each candidate lands in
exactly one bucket, so no dedup pass is needed), while the naive plan is
a full theta-join — O(n·m) compare — that no engine shuffles well. The
oracle IS that naive theta-join (DuckDB runs it as an IEJoin), proving
the rewrite exact.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

Z_BITS = 8  # per-dimension quantization (16-bit Morton code)
Z_BUCKET_SHIFT = 1024  # zval div 1024 → 64 layout buckets
EPS = 0.5  # band half-width on events.value
PROBE_MOD = 997  # probe density for the band join


def _morton_terms(xq: str, yq: str, int_div: str) -> str:
    """Bit-interleave as engine-portable integer arithmetic (div/mod —
    no shift-operator dialect differences): z = Σ bit_i(x)·4^i·1 +
    bit_i(y)·4^i·2."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({xq} {int_div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({yq} {int_div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def sink_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order lineitem on (l_orderkey, l_partkey), write the clustered
    layout, read it back, and report per-bucket extents — the min/max
    rectangles a scan planner would prune with."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    bounds = li.agg(
        F.min("l_orderkey").alias("xmin"),
        F.max("l_orderkey").alias("xmax"),
        F.min("l_partkey").alias("ymin"),
        F.max("l_partkey").alias("ymax"),
    )
    scale = 1 << Z_BITS
    q = li.crossJoin(F.broadcast(bounds)).select(
        "l_orderkey",
        "l_partkey",
        F.expr(
            f"((l_orderkey - xmin) * {scale}) div (xmax - xmin + 1)"
        ).alias("xq"),
        F.expr(
            f"((l_partkey - ymin) * {scale}) div (ymax - ymin + 1)"
        ).alias("yq"),
    )
    z = q.select(
        "l_orderkey",
        "l_partkey",
        F.expr(_morton_terms("xq", "yq", "div")).cast("long").alias("zval"),
    )
    from flink_streaming_gnn_spark.sources.scratch import ephemeral_dir

    out_dir = ephemeral_dir("zorder_layout")
    (
        z.repartitionByRange(16, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir)
    return (
        back.groupBy(
            F.expr(f"zval div {Z_BUCKET_SHIFT}").cast("long").alias("bucket")
        )
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("l_orderkey").cast("long").alias("min_ok"),
            F.max("l_orderkey").cast("long").alias("max_ok"),
            F.min("l_partkey").cast("long").alias("min_pk"),
            F.max("l_partkey").cast("long").alias("max_pk"),
        )
        .orderBy("bucket")
    )


def join_band_epsilon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|value − probe.value| ≤ ε neighborhood stats per probe, via the
    ε-bucket equi-join rewrite (probe side exploded to 3 buckets)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    p = ev.filter(F.col("event_id") % PROBE_MOD == 0).select(
        F.col("event_id").alias("probe_id"), F.col("value").alias("pv")
    )
    pb = F.floor(F.col("pv") / EPS).cast("long")
    expanded = p.select(
        "probe_id",
        "pv",
        F.explode(F.array(pb - 1, pb, pb + 1)).alias("bucket"),
    )
    cand = ev.select(
        F.col("event_id").alias("cand_id"),
        F.col("value").alias("cv"),
        F.floor(F.col("value") / EPS).cast("long").alias("bucket"),
    )
    return (
        cand.join(F.broadcast(expanded), "bucket")
        .filter(
            (F.abs(F.col("cv") - F.col("pv")) <= EPS)
            & (F.col("cand_id") != F.col("probe_id"))
        )
        .groupBy("probe_id")
        .agg(
            F.min("pv").alias("probe_value"),
            F.count("*").cast("long").alias("n_within"),
            F.round(F.avg("cv"), 6).alias("avg_within"),
        )
        .orderBy("probe_id")
    )


QUERIES = {
    "sink_zorder_layout": sink_zorder_layout,
    "join_band_epsilon": join_band_epsilon,
}

_Z_TERMS_DUCK = _morton_terms("xq", "yq", "//")

ORACLE = {
    "sink_zorder_layout": f"""
        WITH b AS (
            SELECT min(l_orderkey) AS xmin, max(l_orderkey) AS xmax,
                   min(l_partkey) AS ymin, max(l_partkey) AS ymax
            FROM lineitem
        ),
        q AS (
            SELECT l_orderkey, l_partkey,
                   ((l_orderkey - xmin) * {1 << Z_BITS}) // (xmax - xmin + 1) AS xq,
                   ((l_partkey - ymin) * {1 << Z_BITS}) // (ymax - ymin + 1) AS yq
            FROM lineitem, b
        ),
        z AS (
            SELECT l_orderkey, l_partkey,
                   CAST({_Z_TERMS_DUCK} AS BIGINT) AS zval
            FROM q
        )
        SELECT CAST(zval // {Z_BUCKET_SHIFT} AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(l_orderkey) AS BIGINT) AS min_ok,
               CAST(max(l_orderkey) AS BIGINT) AS max_ok,
               CAST(min(l_partkey) AS BIGINT) AS min_pk,
               CAST(max(l_partkey) AS BIGINT) AS max_pk
        FROM z
        GROUP BY 1
        ORDER BY bucket
    """,
    "join_band_epsilon": f"""
        SELECT p.event_id AS probe_id,
               min(p.value) AS probe_value,
               CAST(count(*) AS BIGINT) AS n_within,
               round(avg(e.value), 6) AS avg_within
        FROM events p
        JOIN events e
          ON abs(e.value - p.value) <= {EPS} AND e.event_id <> p.event_id
        WHERE p.event_id % {PROBE_MOD} = 0
        GROUP BY p.event_id
        ORDER BY probe_id
    """,
}
