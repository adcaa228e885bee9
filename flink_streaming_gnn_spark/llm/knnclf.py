"""k-NN label classification over the embedding column (SURVEY.md
north-star "similarity search" applied to labeling — the
nearest-neighbor classifier a curation pipeline uses to propagate
labels from a seed set to an unlabeled corpus).

Semantics: held-out vectors (``vec_id % 10 == 8`` — bounded probe set,
the ``llm/simsearch.py`` discipline) are classified by majority label
of their K=5 nearest reference vectors (everything else) by cosine,
with fully deterministic tie-breaks (neighbor cut: cos DESC, cand ASC;
vote: count DESC, label ASC).

Spark-first shape: the scorer is the same Arrow ``mapInPandas`` exact
partial top-K used by ``simsearch_cosine_knn`` — one BLAS matmul per
candidate batch, each task emits only its own top-K per probe, the
global window merges |tasks|·|probes|·K rows. Labels join in
broadcast-gated; votes are one (probe, label) hash agg + one ranking
window. At 100 TB the candidate generation swaps to the IVF cell-join
tier (``simsearch_ivf``) with identical downstream voting — candidates
from the bucketed tier, exactness semantics kept by re-scoring.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.plans.hints import maybe_broadcast
from flink_streaming_gnn_spark.sources.tables import load_table

K_NEIGHBORS = 5
SPLIT_MOD = 10
PROBE_REM = 8  # vec_id % 10 == 8 → probe; else reference


def ml_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probes_rows = (
        emb.filter(F.pmod("vec_id", F.lit(SPLIT_MOD)) == PROBE_REM)
        .select("vec_id", "embedding")
        .collect()
    )
    probes_rows.sort(key=lambda r: r.vec_id)
    p_ids = [int(r.vec_id) for r in probes_rows]
    p_mat = np.array([list(r.embedding) for r in probes_rows], dtype=np.float64)
    p_normed = (p_mat / np.linalg.norm(p_mat, axis=1, keepdims=True)).tolist()
    refs = emb.filter(F.pmod("vec_id", F.lit(SPLIT_MOD)) != PROBE_REM)

    k = K_NEIGHBORS

    def score(batches):
        import numpy as _np
        import pandas as _pd

        pm = _np.asarray(p_normed)
        ids = _np.asarray(p_ids)
        n_probe = len(ids)
        pool_c: list[list] = [[] for _ in range(n_probe)]
        pool_s: list[list] = [[] for _ in range(n_probe)]
        for pdf in batches:
            c = _np.vstack(pdf["embedding"].to_numpy()).astype(_np.float64)
            cn = c / _np.linalg.norm(c, axis=1, keepdims=True)
            s = cn @ pm.T
            cand = pdf["vec_id"].to_numpy()
            n = s.shape[0]
            for j in range(n_probe):
                col = s[:, j]
                if n > k:
                    kth = _np.partition(col, n - k)[n - k]
                    sel = col >= kth  # ties kept; exact cut applied below
                    pool_c[j].append(cand[sel])
                    pool_s[j].append(col[sel])
                else:
                    pool_c[j].append(cand)
                    pool_s[j].append(col)
        out_c, out_p, out_s = [], [], []
        for j in range(n_probe):
            if not pool_c[j]:
                continue
            cc = _np.concatenate(pool_c[j])
            ss = _np.concatenate(pool_s[j])
            order = _np.lexsort((cc, -ss))[:k]  # exact (cos desc, cand asc)
            out_c.append(cc[order])
            out_s.append(ss[order])
            out_p.append(_np.full(len(order), ids[j]))
        if out_c:
            yield _pd.DataFrame(
                {
                    "probe_id": _np.concatenate(out_p),
                    "cand_id": _np.concatenate(out_c),
                    "cos": _np.concatenate(out_s),
                }
            )

    scored = refs.select("vec_id", "embedding").mapInPandas(
        score, schema="probe_id long, cand_id long, cos double"
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    topk = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= K_NEIGHBORS
    )
    labels = maybe_broadcast(
        emb.select(F.col("vec_id").alias("cand_id"), F.col("label").alias("nbr_label"))
    )
    votes = (
        topk.join(labels, "cand_id")
        .groupBy("probe_id", "nbr_label")
        .agg(F.count("*").cast("long").alias("n_votes"))
    )
    wv = Window.partitionBy("probe_id").orderBy(
        F.col("n_votes").desc(), F.col("nbr_label")
    )
    pred = (
        votes.withColumn("rv", F.row_number().over(wv))
        .filter(F.col("rv") == 1)
        .select("probe_id", F.col("nbr_label").alias("pred_label"), "n_votes")
    )
    truth = maybe_broadcast(
        emb.select(F.col("vec_id").alias("probe_id"), F.col("label").alias("true_label"))
    )
    return (
        pred.join(truth, "probe_id")
        .select(
            F.col("probe_id").alias("vec_id"),
            "true_label",
            "pred_label",
            "n_votes",
            (F.col("pred_label") == F.col("true_label")).alias("is_correct"),
        )
        .orderBy("vec_id")
    )


QUERIES = {"ml_knn_classify": ml_knn_classify}

ORACLE = {
    "ml_knn_classify": f"""
        WITH probes AS (
            SELECT vec_id, embedding, label FROM embeddings
            WHERE vec_id % {SPLIT_MOD} = {PROBE_REM}
        ),
        refs AS (
            SELECT vec_id, embedding, label FROM embeddings
            WHERE vec_id % {SPLIT_MOD} <> {PROBE_REM}
        ),
        scored AS (
            SELECT p.vec_id AS probe_id, r.vec_id AS cand_id, r.label,
                   list_dot_product(CAST(p.embedding AS DOUBLE[]),
                                    CAST(r.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(p.embedding AS DOUBLE[]),
                                            CAST(p.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(r.embedding AS DOUBLE[]),
                                              CAST(r.embedding AS DOUBLE[]))))
                       AS cos
            FROM probes p, refs r
        ),
        topk AS (
            SELECT probe_id, label
            FROM (
                SELECT probe_id, label,
                       row_number() OVER (
                           PARTITION BY probe_id ORDER BY cos DESC, cand_id
                       ) AS rk
                FROM scored
            ) WHERE rk <= {K_NEIGHBORS}
        ),
        votes AS (
            SELECT probe_id, label AS nbr_label,
                   CAST(count(*) AS BIGINT) AS n_votes
            FROM topk GROUP BY probe_id, label
        ),
        pred AS (
            SELECT probe_id, nbr_label AS pred_label, n_votes
            FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY probe_id
                           ORDER BY n_votes DESC, nbr_label
                       ) AS rv
                FROM votes
            ) WHERE rv = 1
        )
        SELECT pred.probe_id AS vec_id,
               p.label AS true_label,
               pred.pred_label,
               pred.n_votes,
               pred.pred_label = p.label AS is_correct
        FROM pred JOIN probes p ON p.vec_id = pred.probe_id
        ORDER BY vec_id
    """,
}
