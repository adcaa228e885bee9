"""Minimum spanning forest via distributed Borůvka (SURVEY.md §2B graph
algorithms family — the classic O(log |V|)-round MSF algorithm, the shape
GraphX/Pregel implementations use, re-expressed as DataFrame rounds).

Per round, entirely relationally:
1. pick each component's minimum outgoing edge under the strict total
   order (w, a, b) — one ``min(struct)`` aggregate over the CONTRACTED
   component graph (the composite order makes the choice deterministic
   under weight ties, so the resulting forest is the unique MSF of the
   perturbed order and a valid MSF of the raw weights);
2. the chosen edges form a forest over components; label it with a
   hash-min propagation over that (component-count-sized, ≪ |E|) merge
   graph;
3. CONTRACT: re-key the working edges to the new component endpoints,
   drop intra-component edges, and collapse parallel component-pair
   edges to their (w, a, b)-minimal original edge — |E| shrinks
   geometrically with the component count, so later rounds touch the
   surviving component graph, never the original edge list.

Component count at least halves per round (every component picks an
edge), so the driver loop runs ≤ log₂|V| rounds; per-round driver reads
are O(1) scalars (chosen-edge sum/count + convergence checks), never
data-sized. Every round frame is ``localCheckpoint``-truncated — same
plan-growth discipline as ``graph/components.py``.

LOCAL TAIL (VERDICT r4 "Next round" #7): once the CONTRACTED component
graph is at most ``LOCAL_TAIL_EDGES`` edges — a CONSTANT, so the
collect is scale-invariantly bounded, never data-sized — the remaining
forest is finished with a driver-side union-find Kruskal under the same
(w, a, b) strict total order (which yields the identical unique MSF).
This is the standard tail-contraction of high-performance distributed
CC/MSF (e.g. ConnectIt, Dhulipala et al., PVLDB 2021): Borůvka's last
O(log) rounds operate on a vanishing edge set where per-round job
overhead dominates; at 100 TB the first rounds run distributed and the
tail is the same ≤ 64Ki-edge constant. At verify scale (sf0.01:
48.5k edges) the whole graph IS the tail — the distributed path is
exercised by the ``LOCAL_TAIL_EDGES = 0`` parity test in
tests/test_round5.py, which pins distributed ≡ local on the same
fixture.

Registry key is EXACT-ORACLE since round 9 (was rows-only): the general
recursion is beyond WITH RECURSIVE, but the MSF's uniqueness under the
strict (w, a, b) total order lets the oracle run a verify-scale unrolled
uncontracted Borůvka (``_mst_oracle_sql``); exact parity of the summary
(and the full forest weight) against a from-scratch union-find Kruskal
under the same (w, a, b) order stays pinned in tests/test_round3.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import derive_edges
from flink_streaming_gnn_spark.plans.truncate import fresh_frame
from flink_streaming_gnn_spark.plans.truncate import release_superseded_checkpoints

ROUND_CAP = 48  # components halve per round: covers 2^48 vertices
CC_CAP = 30  # merge-forest label-propagation cap per round
LOCAL_TAIL_EDGES = 65536  # constant local-tail bound (module docstring)


def _simple_weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical undirected simple graph in the 2c / 2s+1 id space:
    multigraph collapsed to min weight per endpoint pair (a < b always —
    customers are even, suppliers odd, and every derived edge crosses)."""
    return (
        derive_edges(spark, sf_dir)
        .select(
            (F.col("src") * 2).alias("a"),
            (F.col("dst") * 2 + 1).alias("b"),
            "w",
        )
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )


def _forest_cc(merge: DataFrame, max_rounds: int = CC_CAP) -> DataFrame:
    """Hash-min connected components WITH POINTER-JUMPING SHORTCUT EDGES
    over the (small) per-round merge forest; returns (v, lbl).

    Each round augments the neighbor lookup with the label map itself as
    edges — (v ↔ lbl(v)) both directions — so one join+agg computes
    ``min(lbl(v), min_nbr lbl, lbl(lbl(v)))``: the hash-min step AND the
    ``lbl ← lbl[lbl]`` shortcut of pointer-jumping in a single round.
    The shortcut halves remaining label-chain length per round, so
    convergence is O(log diameter) instead of O(diameter). That matters
    precisely here: a Borůvka merge forest is built from min-edge parent
    pointers and can be a CHAIN of length ≈ #components (ADVICE r3) —
    hash-min alone needs one full round per hop (measured: a 63-chain
    converges in 7 rounds with shortcuts vs 63 without).

    Loop mechanics (both measured — see ``plans/truncate.py``): the
    evolving ``labels`` frame is referenced exactly TWICE per generation
    (the shortcut union + the lookup join; a self-join formulation makes
    Spark's driver-side planning cost grow ~3×/generation even across
    localCheckpoint), the per-vertex self-edges that replace the outer
    join are static and checkpointed once, each generation passes through
    ``fresh_frame`` to sever accumulated analyzer state, and convergence
    is a sum scalar — labels only decrease, so an unchanged (exact
    decimal) label sum ⟺ no label changed, with no extra join.

    Correctness of the combined operator: labels only decrease, shortcut
    edges stay inside the component (v and lbl(v) share one), and a state
    fixed under this step is fixed under plain hash-min (its updates are
    a subset), which forces per-component-constant minimum labels — so
    the sum-unchanged exit condition matches the plain loop's.
    """
    edges = merge.union(
        merge.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    verts = edges.select(F.col("a").alias("v")).distinct()
    # graph edges + per-vertex self-edges, static across rounds: the
    # self-edge keeps every vertex's own label in the aggregate pool, so
    # no outer join against labels is needed per round
    base = edges.union(
        verts.select(F.col("v").alias("a"), F.col("v").alias("b"))
    ).localCheckpoint()
    labels = verts.withColumn("lbl", F.col("v")).localCheckpoint()
    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        # pointer-jump shortcut edges v → lbl(v): the neighbor lookup then
        # retrieves lbl(lbl(v)) alongside the graph neighbors' labels
        aug = base.union(
            labels.select(F.col("v").alias("a"), F.col("lbl").alias("b"))
        )
        new_labels = fresh_frame(
            aug.join(labels, F.col("b") == labels.v)
            .groupBy("a")
            .agg(F.min("lbl").alias("nl"))
            .select(F.col("a").alias("v"), F.col("nl").alias("lbl"))
            .localCheckpoint()
        )
        lbl_sum = new_labels.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).first()["s"]  # O(1) convergence scalar (exact — no int64 overflow)
        labels = new_labels
        if prev_sum is not None and lbl_sum == prev_sum:
            converged = True
            break
        prev_sum = lbl_sum
    if not converged:
        # A merge forest can be a chain whose diameter exceeds the cap;
        # returning partial labels would leave already-counted forest edges
        # uncontracted in e_cur, letting them be chosen again later and
        # double-counting total_weight/n_mst_edges in a plausible-looking
        # summary. Fail loudly instead (same discipline as ROUND_CAP).
        raise RuntimeError(
            f"_forest_cc did not converge within {max_rounds} rounds; "
            "raise CC_CAP (merge-forest diameter exceeded the cap)"
        )
    return labels


def _kruskal_tail(e_cur: DataFrame) -> tuple[float, int, float]:
    """Driver-side union-find Kruskal over the ≤ LOCAL_TAIL_EDGES
    contracted component graph (collect bounded by the CONSTANT, never
    by data size). Sorting by the same strict (w, a, b) total order the
    distributed rounds use makes the accepted edge set the identical
    unique MSF. Returns (sum_w, n_edges, max_w) of the accepted edges."""
    rows = e_cur.select("u", "v", "w", "a", "b").collect()
    rows.sort(key=lambda r: (r["w"], r["a"], r["b"]))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    s, n, m = 0.0, 0, 0.0
    for r in rows:
        ru, rv = find(r["u"]), find(r["v"])
        if ru != rv:
            parent[ru] = rv
            s += float(r["w"])
            n += 1
            m = max(m, float(r["w"]))
    return s, n, m


@release_superseded_checkpoints
def mst_forest_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borůvka WITH EDGE CONTRACTION: the working edge set is re-keyed to
    component endpoints AND collapsed to the lightest original edge per
    component pair every round, so |E| shrinks geometrically with the
    component count instead of re-joining the full original edge list
    each round (measured at the ≈sf1 probe: the rejoin-everything variant
    cost 685 s over ~17 rounds on 6M edges; contraction makes round r's
    work proportional to the surviving component graph). The global
    vertex→component map is never materialized — the summary needs only
    counts, and #components = #vertices − #forest-edges by the spanning
    invariant."""
    e0 = _simple_weighted_edges(spark, sf_dir)
    # contracted edge: (u, v) component endpoints + the lightest original
    # edge (w, a, b) realizing that component pair. Checkpoint FIRST so
    # the vertex count below reads the materialized frame instead of
    # re-deriving the edge list (was a second full corpus pass).
    e_cur = e0.select(
        F.col("a").alias("u"), F.col("b").alias("v"), "w", "a", "b"
    ).localCheckpoint()
    n_vertices = (
        e_cur.select(F.col("u").alias("v"))
        .union(e_cur.select("v"))
        .distinct()
        .count()
    )
    total_w = 0.0
    n_edges = 0
    max_w = 0.0
    converged = False
    for _ in range(ROUND_CAP):
        # constant-bounded local tail: finish the remaining (contracted)
        # forest with a driver union-find under the same (w, a, b) order
        if e_cur.count() <= LOCAL_TAIL_EDGES:
            s, n, m = _kruskal_tail(e_cur)
            total_w += s
            n_edges += n
            max_w = max(max_w, m)
            converged = True
            break
        ed = F.struct("w", "a", "b", "u", "v").alias("ed")
        cand = e_cur.select(F.col("u").alias("comp"), ed).union(
            e_cur.select(F.col("v").alias("comp"), ed)
        )
        chosen = (
            cand.groupBy("comp")
            .agg(F.min("ed").alias("ed"))
            .select("ed.*")
            .distinct()
            .localCheckpoint()
        )
        stats = chosen.agg(
            F.sum("w").alias("s"), F.count("*").alias("n"), F.max("w").alias("m")
        ).first()  # O(1) scalar read per round (doubles as the empty check:
        # e_cur empty ⟺ no chosen edges, saving the separate isEmpty job)
        if int(stats["n"]) == 0:
            converged = True
            break
        total_w += float(stats["s"])
        n_edges += int(stats["n"])
        max_w = max(max_w, float(stats["m"]))
        lbl = _forest_cc(chosen.select("u", "v").toDF("a", "b"))
        lu = lbl.select(F.col("v").alias("ku"), F.col("lbl").alias("lu"))
        lv = lbl.select(F.col("v").alias("kv"), F.col("lbl").alias("lv"))
        # refresh component endpoints, drop intra-component edges, contract
        # parallel component-pair edges to their (w, a, b)-minimal one
        e_cur = (
            e_cur.join(lu, e_cur.u == lu.ku, "left")
            .join(lv, e_cur.v == lv.kv, "left")
            .select(
                F.coalesce("lu", "u").alias("cu"),
                F.coalesce("lv", "v").alias("cv"),
                "w",
                "a",
                "b",
            )
            .filter(F.col("cu") != F.col("cv"))
            .select(
                F.least("cu", "cv").alias("u"),
                F.greatest("cu", "cv").alias("v"),
                F.struct("w", "a", "b").alias("ed"),
            )
            .groupBy("u", "v")
            .agg(F.min("ed").alias("ed"))
            .select("u", "v", "ed.w", "ed.a", "ed.b")
            .localCheckpoint()
        )
        # sever analyzer-state accumulation across outer generations too
        # (e_cur references lbl twice per round — see plans/truncate.py)
        e_cur = fresh_frame(e_cur)
    if not converged:
        # a silent partial forest would be wrong-but-plausible output;
        # fail loudly instead (components halve per round, so hitting the
        # cap means something else broke)
        raise RuntimeError(f"Borůvka did not converge within {ROUND_CAP} rounds")
    n_components = n_vertices - n_edges  # spanning-forest invariant
    return spark.createDataFrame(
        [
            (
                n_vertices,
                n_components,
                n_edges,
                round(total_w, 2),
                round(max_w, 2),
            )
        ],
        schema="n_vertices long, n_components long, n_mst_edges long, "
        "total_weight double, bottleneck_weight double",
    )


def graph_mst_boruvka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry key: MSF summary row (vertex/component/edge counts, total
    and bottleneck forest weight). EXACT-ORACLE since round 9 (VERDICT r8
    "Next round" #6, was rows-only): the MSF is UNIQUE under the strict
    (w, a, b) total order, so any correct MSF algorithm yields the
    identical edge set — the oracle runs a mechanically-unrolled
    UNCONTRACTED Borůvka (per-round min crossing edge per component +
    pointer-jumped hash-min CC over the accumulated forest, the
    pagerank/LPA unroll trick) sized for the verify scale. Kruskal parity
    + the n_mst_edges == n_vertices − n_components invariant stay pinned
    in tests."""
    return mst_forest_summary(spark, sf_dir)


# Verify-scale unroll budget (oracles only ever run at sf0.01: ~1.6k
# vertices). Components at least halve per Borůvka round → 12 rounds
# cover 2^12 vertices; 13 pointer-jump iterations cover label chains of
# 2^13. Both are idempotent beyond convergence (no crossing edges → no
# chosen edges → forest and labels are fixed points), the ktruss
# ORACLE_ROUNDS discipline.
ORACLE_BORUVKA_ROUNDS = 12
ORACLE_CC_ITERS = 13


def _mst_oracle_sql(
    rounds: int = ORACLE_BORUVKA_ROUNDS, cc_iters: int = ORACLE_CC_ITERS
) -> str:
    """DuckDB twin of the unique-(w,a,b)-MSF summary. Uncontracted
    Borůvka: each round relabels the ORIGINAL collapsed edge list by the
    current component labels (CC of the accumulated forest, recomputed
    from scratch — the forest is ≤|V| edges, so the per-round CC block is
    vertex-bounded, never edge-bounded), picks each component's minimal
    crossing edge, and accumulates. Every CTE is MATERIALIZED (each round
    references its predecessor multiple times — pagerank.py discipline)."""
    blocks = [
        """e0 AS MATERIALIZED (
            SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b,
                   min(l_extendedprice) AS w
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1, 2
        ),
        verts AS MATERIALIZED (
            SELECT a AS v FROM e0 UNION SELECT b AS v FROM e0
        ),
        f_0 AS MATERIALIZED (
            SELECT CAST(NULL AS BIGINT) AS fa, CAST(NULL AS BIGINT) AS fb,
                   CAST(NULL AS DOUBLE) AS fw
            WHERE false
        ),
        l_0_f AS MATERIALIZED (SELECT v, v AS lbl FROM verts)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        blocks.append(f"""cand_{r} AS MATERIALIZED (
            SELECT lu.lbl AS cu, lv.lbl AS cv, e.w, e.a, e.b
            FROM e0 e
            JOIN l_{p}_f lu ON e.a = lu.v
            JOIN l_{p}_f lv ON e.b = lv.v
            WHERE lu.lbl <> lv.lbl
        ),
        chosen_{r} AS MATERIALIZED (
            SELECT DISTINCT w, a, b FROM (
                SELECT w, a, b, row_number() OVER (
                    PARTITION BY comp ORDER BY w, a, b
                ) AS rn
                FROM (
                    SELECT cu AS comp, w, a, b FROM cand_{r}
                    UNION ALL
                    SELECT cv AS comp, w, a, b FROM cand_{r}
                )
            ) WHERE rn = 1
        ),
        f_{r} AS MATERIALIZED (
            SELECT DISTINCT fa, fb, fw FROM (
                SELECT fa, fb, fw FROM f_{p}
                UNION ALL
                SELECT a, b, w FROM chosen_{r}
            )
        ),
        l_{r}_0 AS (SELECT v, v AS lbl FROM verts)""")
        for k in range(1, cc_iters + 1):
            blocks.append(f"""l_{r}_{k} AS MATERIALIZED (
            SELECT g.s AS v, min(l2.lbl) AS lbl FROM (
                SELECT fa AS s, fb AS t FROM f_{r}
                UNION ALL SELECT fb AS s, fa AS t FROM f_{r}
                UNION ALL SELECT v AS s, v AS t FROM verts
                UNION ALL SELECT v AS s, lbl AS t FROM l_{r}_{k - 1}
            ) g JOIN l_{r}_{k - 1} l2 ON g.t = l2.v
            GROUP BY g.s
        )""")
        blocks.append(f"l_{r}_f AS MATERIALIZED (SELECT * FROM l_{r}_{cc_iters})")
    ctes = ",\n        ".join(blocks)
    return f"""
        WITH {ctes}
        SELECT CAST((SELECT count(*) FROM verts) AS BIGINT) AS n_vertices,
               CAST((SELECT count(*) FROM verts)
                    - (SELECT count(*) FROM f_{rounds}) AS BIGINT)
                   AS n_components,
               CAST((SELECT count(*) FROM f_{rounds}) AS BIGINT)
                   AS n_mst_edges,
               round((SELECT coalesce(sum(fw), 0.0) FROM f_{rounds}), 2)
                   AS total_weight,
               round((SELECT coalesce(max(fw), 0.0) FROM f_{rounds}), 2)
                   AS bottleneck_weight
    """


QUERIES = {"graph_mst_boruvka": graph_mst_boruvka}
ORACLE: dict[str, str] = {"graph_mst_boruvka": _mst_oracle_sql()}
