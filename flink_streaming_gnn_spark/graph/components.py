"""Connected components over the derived bipartite graph — the classic
iterative graph operator the relational engine must also express
(SURVEY.md §2B GNN/graph rows; same driver-loop iteration shape as the
reference's A10 feedback edge).

Algorithm: hash-min label propagation. Every vertex starts labeled with
its own id; each round takes the min of its own and its neighbors' labels;
fixpoint = every vertex carries the min vertex id of its component. Each
round is one join + one aggregate (both shuffle on vertex id, so at scale
consecutive rounds reuse the same hash partitioning), and the driver-side
convergence check reads a single count — no row-level data ever reaches
the driver. Rounds needed = graph diameter (small for this corpus's dense
bipartite core). The accelerated variant for adversarial diameters is
large-star/small-star (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14) — same per-round plan shape, fewer rounds.

Vertex-id space: customer c and supplier s collide numerically, so
customers map to 2c and suppliers to 2s+1 (disjoint evens/odds).

Output is the deterministic per-component summary (label = min vertex id
in component, size, customer/supplier breakdown). Round-2 upgrade: EXACT
oracle — not via the |V|²-reachability recursive CTE (still off the
table), but by unrolling the hash-min propagation itself to fixed
MATERIALIZED rounds (linear per round; idempotent past the fixpoint).
Union-find parity stays pinned in tests/test_components.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import EDGES_CTE, derive_edges

MAX_ROUNDS = 25


def _undirected_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derive_edges(spark, sf_dir).select(
        (F.col("src") * 2).alias("a"), (F.col("dst") * 2 + 1).alias("b")
    ).distinct()
    return e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))


def hash_min_cc(edges: DataFrame) -> DataFrame:
    """Hash-min label propagation over an arbitrary undirected edge frame
    ``(a, b)`` (both directions present; self-loops harmless) — returns
    the fixpoint ``(v, lbl)`` labels. Factored out so the streaming
    incremental-CC operator (streaming/graphcc.py) can run the same loop
    per micro-batch on (contracted prior state ∪ new edges)."""
    edges = edges.localCheckpoint()
    labels = (
        edges.select(F.col("a").alias("v")).distinct().withColumn("lbl", F.col("v"))
    ).localCheckpoint()
    for _ in range(MAX_ROUNDS):
        nbr_min = (
            edges.join(labels, edges.b == labels.v)
            .groupBy("a")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr_min, labels.v == nbr_min.a, "left")
            .select(
                "v",
                F.least(
                    F.col("lbl"), F.coalesce("nbr_lbl", F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    # Free the superseded per-round checkpoints NOW instead of "eventually".
    # localCheckpoint blocks live in the block-manager heap (local mode:
    # the driver JVM) and are released by the ContextCleaner only once the
    # Python DataFrame proxies are collected — and those proxies sit in
    # reference cycles that CPython refcounting never breaks, so in a
    # long-lived session every superseded round's |V|-row block set stays
    # live. Measured (round-9 ×100 single-JVM soak): stream_cc_e2e left
    # ~6.2 GiB of post-System.gc() driver heap behind; at ×10 in-process,
    # 1113 MiB and 5 persistent RDDs after the key, dropping to 89 MiB /
    # 0 RDDs after one gc.collect(). DataFrame.unpersist() does NOT free
    # checkpoint blocks (CacheManager path only — probed), so the cycle
    # collection at kernel exit is the deterministic release. The returned
    # final labels frame stays live (the caller's data), freed the same
    # way when the caller drops it.
    import gc

    gc.collect()
    return labels


def cc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex component labels by hash-min propagation (driver loop
    with an O(1)-size convergence read per round).

    Each round ends in an eager ``localCheckpoint``: every round's plan
    references the previous labels frame TWICE (the neighbor-min join and
    the convergence anti-comparison), and plan-tree re-analysis doubles per
    shared reference — persist caches data but keeps the logical plan, so
    a persist-only loop pays 2^round Catalyst analysis by late rounds
    (measured pathologically on the HITS loop, graph/hits.py). Checkpoint
    truncates the plan to a leaf; analysis stays O(1) per round."""
    return hash_min_cc(_undirected_edges(spark, sf_dir))


def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-component summary: label (min vertex id), total size, and the
    customer/supplier split — deterministic, so invariant tests can pin it
    exactly against union-find."""
    labels = cc_labels(spark, sf_dir)
    return (
        labels.groupBy("lbl")
        .agg(
            F.count("*").cast("long").alias("n_vertices"),
            F.sum(((F.col("v") % 2) == 0).cast("long")).cast("long").alias("n_customers"),
            F.sum(((F.col("v") % 2) == 1).cast("long")).cast("long").alias("n_suppliers"),
        )
        .select(
            F.col("lbl").cast("long").alias("component"),
            "n_vertices",
            "n_customers",
            "n_suppliers",
        )
        .orderBy("component")
    )
    # the summary is built directly on the final checkpointed labels frame
    # (lineage-free, so no recompute risk); worst-case #components is
    # O(|V|), so the result must never be collected to the driver —
    # intermediate round frames are reclaimed by the ContextCleaner once
    # they go out of scope


QUERIES = {"graph_connected_components": graph_connected_components}

CC_ORACLE_ROUNDS = 20  # ≥ fixture diameter; extra rounds are no-ops at fixpoint


def _cc_oracle_sql(rounds: int = CC_ORACLE_ROUNDS) -> str:
    """Round-2 upgrade from rows-only: the |V|²-reachability recursive CTE
    stays off the table, but the HASH-MIN propagation itself unrolls to
    fixed rounds of |V|-state min-joins (the LPA/k-core/PageRank trick) —
    linear per round, exact once the unroll covers the diameter, and
    harmless beyond it (min-propagation is idempotent at fixpoint). All
    CTEs MATERIALIZED (each round referenced twice)."""
    blocks = [
        """de AS MATERIALIZED (
            SELECT DISTINCT src * 2 AS a, dst * 2 + 1 AS b FROM edges
        ),
        ue AS MATERIALIZED (
            SELECT a, b FROM de UNION ALL SELECT b AS a, a AS b FROM de
        ),
        l0 AS MATERIALIZED (
            SELECT DISTINCT a AS v, a AS lbl FROM ue
        )"""
    ]
    for r in range(1, rounds + 1):
        blocks.append(f"""nmin{r} AS MATERIALIZED (
            SELECT ue.a, min(l.lbl) AS m
            FROM ue JOIN l{r - 1} l ON l.v = ue.b
            GROUP BY ue.a
        ),
        l{r} AS MATERIALIZED (
            SELECT l.v, least(l.lbl, COALESCE(n.m, l.lbl)) AS lbl
            FROM l{r - 1} l LEFT JOIN nmin{r} n ON n.a = l.v
        )""")
    body = ",\n        ".join(blocks)
    return f"""
        WITH {EDGES_CTE},
        {body}
        SELECT CAST(lbl AS BIGINT) AS component,
               CAST(count(*) AS BIGINT) AS n_vertices,
               CAST(sum(CASE WHEN v % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_customers,
               CAST(sum(CASE WHEN v % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_suppliers
        FROM l{rounds}
        GROUP BY lbl
        ORDER BY component
    """


ORACLE = {"graph_connected_components": _cc_oracle_sql()}
