"""Hard plan-state truncation for long iterative driver loops.

``localCheckpoint(eager=True)`` truncates the logical plan (LogicalRDD)
and the RDD lineage — but measured on this Spark build, a loop that
rebinds a frame every generation and references it more than twice per
generation still accumulates driver-side analyzer/planner state ACROSS
checkpoints: per-generation planning cost stays ~0.3 s for the first
~13 generations and then grows ~2.5–3× per generation (0.4 → 1.4 → 5 →
13 → 35 s ...), eventually OOMing a 24 g driver heap — while the logical
plan string and ``rdd.toDebugString`` both stay constant-size. (Shapes
that reference the evolving frame at most twice per generation — the
components/pagerank loops — measure flat for 25+ generations; a
self-join of the frame with a projection of itself is the worst case.)

``fresh_frame`` severs that accumulation: it re-wraps a (materialized —
call it on a just-checkpointed frame) DataFrame's JVM row RDD as a brand
new DataFrame via ``createDataFrame(jdf.rdd(), jdf.schema())``. The new
frame shares no analyzer bookkeeping with its ancestry; measured, the
same 25-generation loop stays flat at ~0.33 s/generation. Cost is one
JVM-side InternalRow→Row conversion of the frame's rows per generation —
proportional to the (small, shrinking) iterative state, never the
corpus, and no data crosses the Python boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fresh_frame(df: DataFrame) -> DataFrame:
    """Re-wrap a materialized (checkpointed) DataFrame as a fresh one with
    no inherited analyzer/planner state. Use inside iterative loops right
    after ``localCheckpoint()`` when the loop self-references the evolving
    frame more than twice per generation."""
    spark = df.sparkSession
    jdf = df._jdf  # noqa: SLF001 — deliberate JVM-side re-wrap, no collect
    return DataFrame(
        spark._jsparkSession.createDataFrame(jdf.rdd(), jdf.schema()),  # noqa: SLF001
        spark,
    )
