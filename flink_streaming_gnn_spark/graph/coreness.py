"""Full core decomposition — per-vertex coreness via the h-index
iteration (Montresor, De Pellegrini, Miorandi, "Distributed k-core
decomposition", IEEE TPDS 2013; Lü et al. 2016 for the h-operator
fixpoint): start every vertex at its degree and repeatedly replace each
estimate with the h-index of its neighbors' estimates. The operator is
monotone non-increasing, idempotent past the fixpoint, and converges to
the exact coreness — the *whole* core hierarchy, where ``graph_kcore``
answers only membership at one fixed k.

Spark-first round: one join (estimates onto directed neighbor lists),
one per-vertex h-index — computed relationally as
``max(least(rank, est))`` over the estimate-descending row_number — and
one element-wise ``least`` with the previous estimate. Two shuffles per
round, both keyed on vertex id; the driver reads one O(1) changed-count
scalar; rounds are ``localCheckpoint``-truncated (components/bfs
discipline).

Exact oracle: monotone + idempotent ⇒ ORACLE_ROUNDS unrolled
MATERIALIZED round CTEs with ORACLE_ROUNDS ≥ the measured sf0.01
convergence depth (4) reproduce the fixpoint exactly; all-integer
state, so the hash is rounding-free. Exact-peeling parity (min-heap
algorithm) is pinned in tests/test_round3b.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_streaming_gnn_spark.graph.edges import derive_edges
from flink_streaming_gnn_spark.plans.truncate import release_superseded_checkpoints

ORACLE_ROUNDS = 6  # ≥ measured sf0.01 convergence (4) — idempotent beyond
MAX_ROUNDS = 60


def _undirected(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        derive_edges(spark, sf_dir)
        .select((F.col("src") * 2).alias("a"), (F.col("dst") * 2 + 1).alias("b"))
        .distinct()
    )
    return e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))


@release_superseded_checkpoints
def graph_coreness_hindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry key: (v, coreness) for every vertex — the exact core
    number, computed to fixpoint."""
    ue = _undirected(spark, sf_dir).localCheckpoint()
    est = (
        ue.groupBy("a").agg(F.count("*").alias("est"))
        .select(F.col("a").alias("v"), "est")
        .localCheckpoint()
    )
    w = Window.partitionBy("a").orderBy(F.col("est").desc())
    for _ in range(MAX_ROUNDS):
        nb = ue.join(est, ue.b == est.v).select("a", "est")
        h = (
            nb.withColumn("rn", F.row_number().over(w))
            .groupBy("a")
            .agg(F.max(F.least("rn", "est")).alias("h"))
        )
        new_est = (
            est.join(h, est.v == h.a)
            .select("v", F.least("est", "h").alias("est"))
            .localCheckpoint()
        )
        changed = (
            new_est.alias("n")
            .join(est.alias("o"), "v")
            .filter(F.col("n.est") != F.col("o.est"))
            .count()  # O(1) convergence scalar
        )
        est = new_est
        if changed == 0:
            break
    return est.select(
        F.col("v").cast("long").alias("v"),
        F.col("est").cast("long").alias("coreness"),
    ).orderBy("v")


def _coreness_oracle_sql(rounds: int = ORACLE_ROUNDS) -> str:
    blocks = [
        """d AS MATERIALIZED (
            SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        ue AS MATERIALIZED (
            SELECT a, b FROM d UNION ALL SELECT b AS a, a AS b FROM d
        ),
        est0 AS MATERIALIZED (
            SELECT a AS v, count(*) AS est FROM ue GROUP BY a
        )"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        blocks.append(f"""h{r} AS MATERIALIZED (
            SELECT a, max(least(rn, est)) AS h FROM (
                SELECT ue.a, e.est,
                       row_number() OVER (PARTITION BY ue.a ORDER BY e.est DESC)
                           AS rn
                FROM ue JOIN est{p} e ON e.v = ue.b
            ) GROUP BY a
        ),
        est{r} AS MATERIALIZED (
            SELECT e.v, least(e.est, h{r}.h) AS est
            FROM est{p} e JOIN h{r} ON h{r}.a = e.v
        )""")
    body = ",\n        ".join(blocks)
    return f"""
        WITH {body}
        SELECT CAST(v AS BIGINT) AS v, CAST(est AS BIGINT) AS coreness
        FROM est{rounds}
        ORDER BY v
    """


QUERIES = {"graph_coreness_hindex": graph_coreness_hindex}
ORACLE = {"graph_coreness_hindex": _coreness_oracle_sql()}
