"""Mini-batch sampling primitives for GNN training (SURVEY.md §2A A3/A10:
the reference's training loop consumes per-vertex neighborhoods and
positive/negative edge pairs; GraphSAGE's fixed-fanout neighbor sampling
and link-prediction negative sampling are the two standard generators).

Spark-first shape — both are *deterministic* relational plans, not RNG
loops:

* neighbor sampling = one window rank per dst vertex over a content hash
  (md5 of the edge key) — a uniform-but-reproducible order — filtered to
  the fanout K. One shuffle on dst; no Python, no state.
* negative sampling = an affine hash of (src, k) into the supplier id
  space, anti-joined against the real edge set so only true negatives
  survive. The candidate generator is a pure projection (zero shuffle);
  the anti-join is the only exchange, on the same (src, dst) key a
  link-prediction trainer joins on next.

Scale posture: per-vertex sampling via window-rank is exactly the
WindowGroupLimit pattern Spark pushes down (top-K per key without a full
sort); a hot vertex costs O(deg) not O(deg log deg). The negative
candidate space never materializes the |V|×|V| complement — K candidates
per source, collision-filtered by the anti-join.

Determinism note: md5 is identical in Spark and DuckDB (lowercase hex over
the same bytes), so the sampled sets hash-match the oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_streaming_gnn_spark.graph.edges import EDGES_CTE, derive_edges
from flink_streaming_gnn_spark.sources.tables import load_table

FANOUT = 5  # neighbors kept per vertex
NEG_K = 3  # negative candidates per source vertex
_MULT = 2654435761  # Knuth multiplicative-hash constant
_STEP = 40503


def graph_neighbor_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-fanout in-neighbor sample: per dst vertex keep FANOUT sources,
    ordered by md5(src:dst) — a reproducible uniform draw shared with the
    oracle. Output (vertex, neighbor, sample_rank)."""
    e = derive_edges(spark, sf_dir).select("src", "dst").distinct()
    h = F.md5(F.concat_ws(":", F.col("src"), F.col("dst")))
    w = Window.partitionBy("dst").orderBy(h.asc(), F.col("src").asc())
    return (
        e.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= FANOUT)
        .select(
            F.col("dst").alias("vertex"),
            F.col("src").alias("neighbor"),
            F.col("sample_rank").cast("long").alias("sample_rank"),
        )
    )


def graph_negative_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction negatives: for every source vertex with at least one
    real edge, NEG_K deterministic candidate destinations
    ``(src*MULT + k*STEP) % |S| + 1`` with the true edges anti-joined away.
    Output (src, neg_dst, k)."""
    e = derive_edges(spark, sf_dir).select("src", "dst").distinct()
    srcs = e.select("src").distinct()
    # 1-row supplier count, cross-joined so the plan stays declarative
    # (broadcast of a scalar — no driver-side collect in the data path)
    s_cnt = load_table(spark, sf_dir, "supplier").agg(
        F.count("*").cast("long").alias("s_cnt")
    )
    cands = (
        srcs.crossJoin(F.broadcast(s_cnt))
        .select("src", "s_cnt", F.explode(F.sequence(F.lit(0), F.lit(NEG_K - 1))).alias("k"))
        .select(
            "src",
            ((F.col("src") * _MULT + F.col("k") * _STEP) % F.col("s_cnt") + 1)
            .cast("long")
            .alias("neg_dst"),
            F.col("k").cast("long").alias("k"),
        )
    )
    return cands.join(
        e, (cands.src == e.src) & (cands.neg_dst == e.dst), "left_anti"
    ).select("src", "neg_dst", "k")


QUERIES = {
    "graph_neighbor_sample": graph_neighbor_sample,
    "graph_negative_sample": graph_negative_sample,
}

ORACLE = {
    "graph_neighbor_sample": f"""
        WITH {EDGES_CTE},
        de AS (SELECT DISTINCT src, dst FROM edges),
        ranked AS (
            SELECT src, dst,
                   row_number() OVER (
                       PARTITION BY dst
                       ORDER BY md5(CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)), src
                   ) AS sample_rank
            FROM de
        )
        SELECT dst AS vertex, src AS neighbor,
               CAST(sample_rank AS BIGINT) AS sample_rank
        FROM ranked WHERE sample_rank <= {FANOUT}
    """,
    "graph_negative_sample": f"""
        WITH {EDGES_CTE},
        de AS (SELECT DISTINCT src, dst FROM edges),
        s AS (SELECT CAST(count(*) AS BIGINT) AS s_cnt FROM supplier),
        cands AS (
            SELECT d.src,
                   CAST((d.src * {_MULT} + k.k * {_STEP}) % s.s_cnt + 1 AS BIGINT) AS neg_dst,
                   CAST(k.k AS BIGINT) AS k
            FROM (SELECT DISTINCT src FROM de) d
            CROSS JOIN s
            CROSS JOIN (SELECT unnest(generate_series(0, {NEG_K - 1})) AS k) k
        )
        SELECT c.src, c.neg_dst, c.k
        FROM cands c
        WHERE NOT EXISTS (
            SELECT 1 FROM de e WHERE e.src = c.src AND e.dst = c.neg_dst
        )
    """,
}
