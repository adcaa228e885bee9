"""Decision-stump induction over the embedding table (SURVEY.md §2B ML
tier, next to ``ml_nb_train`` / ``ml_knn_classify`` / ``ml_kmeans_lloyd``):
find the best single-feature threshold split for predicting ``label``
from the first embedding coordinate — the weak learner every boosting
stack is built from, and the exact histogram-split primitive inside
distributed GBDT implementations (XGBoost/LightGBM "hist" mode).

Spark-first shape — the classic HISTOGRAM split search:

1. one 2-row aggregate pins the feature's global [min, max];
2. one distributed pass bins every row into ``N_BINS`` fixed-width bins
   and pivots the per-bin class counts to 10 label columns (a single
   hash aggregate, output ≤ N_BINS rows no matter the corpus);
3. cumulative sums over the bin axis give the left/right class
   histograms of every candidate threshold at once, and the weighted
   Gini impurity of each split is evaluated from those counts.

The Gini expression is written out column-by-column (c0² + … + c9²), so
both engines evaluate the identical IEEE expression tree on identical
integer inputs — the argmin over thresholds is therefore deterministic,
no rounding needed before the final display rounding. Bin assignment is
a single sub/div/mul/floor chain on doubles (deterministic IEEE), with
the x = max edge clamped into the last bin.

The DuckDB oracle recomputes the whole search (bins, cumsums, Gini,
argmin) in SQL — a full cross-engine check of the split decision, not
just the winning row's shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

N_BINS = 32
LABELS = list(range(10))


def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.element_at("embedding", 1).cast("double").alias("x"), "label"
    )
    bounds = emb.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    binned = emb.join(F.broadcast(bounds)).select(
        F.least(
            F.floor((F.col("x") - F.col("lo")) / (F.col("hi") - F.col("lo")) * N_BINS),
            F.lit(N_BINS - 1),
        )
        .cast("int")
        .alias("bin"),
        "label",
        "lo",
        "hi",
    )
    hist = binned.groupBy("bin", "lo", "hi").agg(
        *[
            F.sum((F.col("label") == l).cast("long")).alias(f"c{l}")
            for l in LABELS
        ]
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = hist.select(
        "bin",
        "lo",
        "hi",
        *[F.sum(f"c{l}").over(w).alias(f"L{l}") for l in LABELS],
        *[F.sum(f"c{l}").over(wall).alias(f"T{l}") for l in LABELS],
    )
    n_left = sum(F.col(f"L{l}") for l in LABELS)
    n_total = sum(F.col(f"T{l}") for l in LABELS)
    n_right = n_total - n_left
    s_left = sum(F.col(f"L{l}") * F.col(f"L{l}") for l in LABELS)
    s_right = sum(
        (F.col(f"T{l}") - F.col(f"L{l}")) * (F.col(f"T{l}") - F.col(f"L{l}"))
        for l in LABELS
    )
    gini = (
        (n_left.cast("double") - s_left.cast("double") / n_left)
        + (n_right.cast("double") - s_right.cast("double") / n_right)
    ) / n_total

    def majority(prefix: str, counts: list[Column]) -> Column:
        m = F.greatest(*counts)
        expr = F.lit(None).cast("int")
        for l in reversed(LABELS):
            expr = F.when(counts[l] == m, F.lit(l)).otherwise(expr)
        return expr.alias(f"{prefix}_majority")

    left_counts = [F.col(f"L{l}") for l in LABELS]
    right_counts = [F.col(f"T{l}") - F.col(f"L{l}") for l in LABELS]
    scored = (
        cum.filter((n_left > 0) & (n_right > 0) & (F.col("bin") < N_BINS - 1))
        .select(
            F.col("bin").cast("long").alias("split_bin"),
            F.round(
                F.col("lo")
                + (F.col("bin") + 1) * (F.col("hi") - F.col("lo")) / N_BINS,
                6,
            ).alias("threshold"),
            n_left.cast("long").alias("n_left"),
            n_right.cast("long").alias("n_right"),
            gini.alias("_g"),
            majority("left", left_counts),
            majority("right", right_counts),
        )
    )
    return (
        scored.orderBy("_g", "split_bin")
        .limit(1)
        .select(
            "split_bin",
            "threshold",
            "n_left",
            "n_right",
            F.round("_g", 6).alias("weighted_gini"),
            "left_majority",
            "right_majority",
        )
    )


def _stump_oracle() -> str:
    c_cols = ",\n                   ".join(
        f"CAST(sum(CASE WHEN label = {l} THEN 1 ELSE 0 END) AS BIGINT) AS c{l}"
        for l in LABELS
    )
    cum_cols = ",\n                   ".join(
        f"sum(c{l}) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING"
        f" AND CURRENT ROW) AS L{l},\n                   "
        f"sum(c{l}) OVER () AS T{l}"
        for l in LABELS
    )
    n_left = " + ".join(f"L{l}" for l in LABELS)
    n_total = " + ".join(f"T{l}" for l in LABELS)
    s_left = " + ".join(f"L{l} * L{l}" for l in LABELS)
    s_right = " + ".join(f"(T{l} - L{l}) * (T{l} - L{l})" for l in LABELS)
    lmaj = " ".join(
        f"WHEN L{l} = greatest({', '.join('L%d' % k for k in LABELS)})"
        f" THEN {l}"
        for l in LABELS
    )
    rmaj = " ".join(
        f"WHEN T{l} - L{l} = greatest("
        f"{', '.join('T%d - L%d' % (k, k) for k in LABELS)}) THEN {l}"
        for l in LABELS
    )
    return f"""
        WITH pts AS (
            SELECT CAST(embedding[1] AS DOUBLE) AS x, label FROM embeddings
        ),
        bounds AS (SELECT min(x) AS lo, max(x) AS hi FROM pts),
        binned AS (
            SELECT least(CAST(floor((x - lo) / (hi - lo) * {N_BINS}) AS INTEGER),
                         {N_BINS - 1}) AS bin,
                   label, lo, hi
            FROM pts, bounds
        ),
        hist AS (
            SELECT bin, lo, hi,
                   {c_cols}
            FROM binned GROUP BY bin, lo, hi
        ),
        cum AS (
            SELECT bin, lo, hi,
                   {cum_cols}
            FROM hist
        ),
        scored AS (
            SELECT CAST(bin AS BIGINT) AS split_bin,
                   round(lo + (bin + 1) * (hi - lo) / {N_BINS}, 6) AS threshold,
                   CAST({n_left} AS BIGINT) AS n_left,
                   CAST(({n_total}) - ({n_left}) AS BIGINT) AS n_right,
                   ((({n_left}) - CAST({s_left} AS DOUBLE) / ({n_left}))
                    + ((({n_total}) - ({n_left}))
                       - CAST({s_right} AS DOUBLE) / (({n_total}) - ({n_left}))))
                       / ({n_total}) AS g,
                   CASE {lmaj} END AS left_majority,
                   CASE {rmaj} END AS right_majority
            FROM cum
            WHERE ({n_left}) > 0 AND ({n_total}) - ({n_left}) > 0
              AND bin < {N_BINS - 1}
        )
        SELECT split_bin, threshold, n_left, n_right,
               round(g, 6) AS weighted_gini, left_majority, right_majority
        FROM scored
        ORDER BY g, split_bin
        LIMIT 1
    """


QUERIES = {"ml_decision_stump": ml_decision_stump}
ORACLE = {"ml_decision_stump": _stump_oracle()}
