"""HDRF streaming vertex-cut partitioner — the reference's A4 operator
(SURVEY.md §2A: greedy edge placement minimizing vertex replication,
balance-weighted; algorithm: Petroni et al., "HDRF: Stream-Based
Partitioning for Power-Law Graphs", CIKM 2015).

The reference runs this as a *serial* stateful operator ahead of its keyBy
(SURVEY.md §3.1 — "serial bottleneck by design"): partial vertex degrees and
replica sets live in one pass over the edge stream. We keep that shape
faithfully — a single sorted partition folded by a self-contained pandas
function — because the algorithm is sequential by definition.

Scale posture: HDRF here exists for replication-factor parity experiments
(its sole purpose in the reference: fewer replicas → less SYNC traffic).
Under Spark's shuffle model replica placement is not our problem —
production partitioning is hash + AQE (graph_partition_assign). At 100 TB
you would never serialize the stream through one task; you'd chunk per
time-window and accept slightly worse replication, or skip HDRF entirely.

Everything downstream of the per-edge assignment (part sizes, replication
factor) is computed relationally in Spark, not inside the Python fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import derive_edges

N_PARTS = 8
LAMBDA = 1.0


def make_hdrf_core(n_parts: int = N_PARTS, lam: float = LAMBDA):
    """Build the self-contained HDRF fold: pandas DataFrame with (src, dst)
    in stream order → same rows + ``part_id``.

    Defined nested so cloudpickle ships it *by value* to executors (the
    engine is driven from foreign cwds where this package isn't
    importable); the closure touches only stdlib + pandas.
    """

    def hdrf_core(pdf):
        import pandas as pd
        from collections import defaultdict

        deg: dict = defaultdict(int)
        replicas: dict = defaultdict(set)
        sizes = [0] * n_parts
        out = []
        eps = 1.0
        for u, v in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
            # partial degrees update first (HDRF §3: degrees seen so far)
            deg[u] += 1
            deg[v] += 1
            du, dv = deg[u], deg[v]
            theta_u = du / (du + dv)
            theta_v = 1.0 - theta_u
            max_s, min_s = max(sizes), min(sizes)
            best_p, best_score = 0, float("-inf")
            for p in range(n_parts):
                g = 0.0
                if p in replicas[u]:
                    g += 1.0 + (1.0 - theta_u)  # prefer low-degree vertex's parts
                if p in replicas[v]:
                    g += 1.0 + (1.0 - theta_v)
                bal = (max_s - sizes[p]) / (eps + max_s - min_s)
                score = g + lam * bal
                if score > best_score + 1e-12:  # strict: first best wins (deterministic)
                    best_p, best_score = p, score
            replicas[u].add(best_p)
            replicas[v].add(best_p)
            sizes[best_p] += 1
            out.append(best_p)
        return pd.DataFrame({"src": pdf["src"], "dst": pdf["dst"], "part_id": out})

    return hdrf_core


def hdrf_assign_edges(
    spark: SparkSession, sf_dir: str, n_parts: int = N_PARTS, lam: float = LAMBDA
) -> DataFrame:
    """Per-edge HDRF part assignment over the fixture graph, edges replayed
    in deterministic stream order (ts, src, dst, w)."""
    core = make_hdrf_core(n_parts, lam)

    def run(pdf_iter):
        import pandas as pd

        chunks = [pdf for pdf in pdf_iter]
        edges = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame(columns=["src", "dst"])
        )
        yield core(edges)

    e = (
        derive_edges(spark, sf_dir)
        .orderBy("ts", "src", "dst", "w")
        .select("src", "dst")
        .coalesce(1)
    )
    return e.mapInPandas(run, schema="src long, dst long, part_id int")


def graph_hdrf_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part summary of the HDRF assignment: edge count and hosted
    (replica) vertex count per part. Rows-only check — the fold is a
    sequential state machine, not SQL-expressible; invariants (edge
    conservation, replication factor beats hash partitioning) are pinned
    in tests/test_graph_hdrf.py."""
    assigned = hdrf_assign_edges(spark, sf_dir)
    hosted = (
        assigned.select(F.col("src").alias("vertex"), "part_id")
        .unionByName(assigned.select(F.col("dst").alias("vertex"), "part_id"))
        .distinct()
    )
    per_part_edges = assigned.groupBy("part_id").agg(
        F.count("*").cast("long").alias("n_edges")
    )
    per_part_hosted = hosted.groupBy("part_id").agg(
        F.count("*").cast("long").alias("n_hosted_vertices")
    )
    return per_part_edges.join(per_part_hosted, "part_id").select(
        F.col("part_id").cast("long").alias("part_id"), "n_edges", "n_hosted_vertices"
    )


def replication_factor(assigned: DataFrame) -> float:
    """Mean replicas per vertex of an (src, dst, part_id) edge assignment —
    the metric HDRF minimizes (reference: fewer replicas = less SYNC)."""
    hosted = (
        assigned.select(F.col("src").alias("vertex"), "part_id")
        .unionByName(assigned.select(F.col("dst").alias("vertex"), "part_id"))
        .distinct()
    )
    n_replicas = hosted.count()
    n_vertices = hosted.select("vertex").distinct().count()
    return n_replicas / n_vertices


QUERIES = {"graph_hdrf_partition": graph_hdrf_partition}

# rows-only: sequential streaming state machine (no SQL twin); see tests.
ORACLE: dict[str, str] = {}
