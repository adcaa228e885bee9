"""Training-side operators: the reference's train/test splitter (SURVEY.md
§2A A3), the vertex-classification readout (A13) and the iteration/
parameter-server loop (A10/A14), re-expressed Spark-first.

Design (SURVEY.md §4.4 "hard parts" #1): Structured Streaming has no cycles,
and the reference's hand-built iteration head/tail (A10) existed only
because Flink lacked them too. The Spark-native shape is a *driver loop*:
each epoch is a pure DataFrame pass — forward (joins/aggs/pandas-UDF),
per-partition gradient partials (Arrow-batched), a tiny driver-side reduce
(the gradient matrix is out_dim × n_classes — bytes, not data), then the
updated weights re-enter the next pass via closure capture = the broadcast
parameter-server sync (A14).

At 100 TB the same loop holds: gradients are algebraic partial aggregates
(map-side combine to one small matrix per partition), so each epoch is one
scan + one tree-reduce — the driver never sees row-level data.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.sage import OUT_DIM, graph_sage_layer
from flink_streaming_gnn_spark.sources.tables import load_table

N_CLASSES = 10  # embeddings.label ∈ [0, 10) (FIXTURES.md)
SPLIT_MOD = 10
TRAIN_PARTS = 8  # 80/20 deterministic split


def _sf_of(sf_dir: str) -> float:
    """Parse the scale factor out of a fixture dir name (``.../sf0.01``).
    Unknown layouts conservatively count as full scale."""
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    try:
        return float(m.group(1).rstrip(".")) if m else 1.0
    except ValueError:
        return 1.0


def _epochs_for(sf_dir: str, small: int, full: int) -> int:
    """Verify-time cost control: the driver's oracle run (sf0.01) and pytest
    (sf0.001) only need the loss-decrease / readout invariants, which two or
    three gradient steps already exhibit — don't burn 10 full scans there."""
    return small if _sf_of(sf_dir) <= 0.01 else full


def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stream-safe train/test routing (reference A3): a pure
    function of the vertex id, so every operator — batch or streaming,
    any partitioning — agrees on the split without coordination."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.when(F.pmod("vec_id", F.lit(SPLIT_MOD)) < TRAIN_PARTS, "train")
        .otherwise("test")
        .alias("split"),
    )


def _sage_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-layer SAGE embeddings (h1..h4) joined with label + split — the
    readout's input. The forward is the oracle-checked graph_sage_layer."""
    h = graph_sage_layer(spark, sf_dir)
    split = train_test_split(spark, sf_dir)
    return h.join(split, "vec_id")


def softmax_epoch_losses(
    feats: DataFrame, epochs: int = 5, lr: float = 0.5
) -> tuple[np.ndarray, list[float]]:
    """Softmax-regression readout trained by full-batch gradient descent.

    Per epoch: executors compute per-Arrow-batch partial (gradient, loss,
    count) against the *broadcast* weights (closure capture = A14 param
    server); the driver sums the tiny partials and updates W (A10 feedback
    edge, driver-side). Returns (final weights, per-epoch mean loss).
    """
    feat_cols = [f"h{i}" for i in range(1, OUT_DIM + 1)]
    train = feats.filter(F.col("split") == "train").select(*feat_cols, "label")
    w = np.zeros((OUT_DIM, N_CLASSES))
    losses: list[float] = []
    n_classes = N_CLASSES

    for _ in range(epochs):
        w_list = w.tolist()  # ship by value

        def partials(pdf_iter):
            import numpy as _np
            import pandas as _pd

            W = _np.asarray(w_list)
            for pdf in pdf_iter:
                X = pdf[[c for c in pdf.columns if c != "label"]].to_numpy(
                    dtype=_np.float64
                )
                y = pdf["label"].to_numpy(dtype=_np.int64)
                logits = X @ W
                logits -= logits.max(axis=1, keepdims=True)
                p = _np.exp(logits)
                p /= p.sum(axis=1, keepdims=True)
                onehot = _np.eye(n_classes)[y]
                grad = X.T @ (p - onehot)
                loss = float(-_np.log(p[_np.arange(len(y)), y] + 1e-12).sum())
                yield _pd.DataFrame(
                    {
                        "grad": [grad.flatten().tolist()],
                        "loss": [loss],
                        "n": [len(y)],
                    }
                )

        got = train.mapInPandas(
            partials, schema="grad array<double>, loss double, n long"
        ).collect()  # one tiny row per Arrow batch: out_dim*n_classes doubles
        grad = np.zeros((OUT_DIM, N_CLASSES))
        loss_sum, n_sum = 0.0, 0
        for row in got:
            grad += np.asarray(row["grad"]).reshape(OUT_DIM, N_CLASSES)
            loss_sum += row["loss"]
            n_sum += row["n"]
        w -= lr * grad / max(n_sum, 1)
        losses.append(loss_sum / max(n_sum, 1))
    return w, losses


def graph_train_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch training loss of the softmax readout over SAGE embeddings
    (reference EP3: epoch barrier = end of driver-loop pass). Rows-only —
    float partial-sum order varies with partitioning; row count (= epochs)
    and monotone-decrease are pinned in tests."""
    feats = _sage_features(spark, sf_dir)
    _, losses = softmax_epoch_losses(feats, epochs=_epochs_for(sf_dir, 2, 5))
    return spark.createDataFrame(
        [(i + 1, round(lo, 4)) for i, lo in enumerate(losses)],
        "epoch long, mean_loss double",
    )


def graph_train_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertex-classification readout (A13): train the softmax head, report
    per-class test counts and correct predictions. Rows-only (learned
    weights; invariants — classes covered, accuracy above chance on the
    planted structure — pinned in tests)."""
    feats = _sage_features(spark, sf_dir).persist()
    try:
        w, _ = softmax_epoch_losses(feats, epochs=_epochs_for(sf_dir, 3, 10))
        w_list = w.tolist()
        feat_cols = [f"h{i}" for i in range(1, OUT_DIM + 1)]
        test = feats.filter(F.col("split") == "test")

        # argmax(X @ W) as JVM expressions: one score column per class,
        # greatest() + chained when() — no Python on the scoring path.
        scores = [
            sum(
                (F.col(feat_cols[d]) * F.lit(float(w_list[d][c])) for d in range(OUT_DIM)),
                start=F.lit(0.0),
            )
            for c in range(N_CLASSES)
        ]
        best = F.greatest(*scores)
        pred = None
        for c, s in enumerate(scores):
            pred = F.when(s == best, c) if pred is None else pred.when(s == best, c)
        scored = test.select("label", pred.cast("long").alias("pred"))
        return (
            scored.groupBy("label")
            .agg(
                F.count("*").cast("long").alias("n_test"),
                F.sum((F.col("pred") == F.col("label")).cast("long"))
                .cast("long")
                .alias("n_correct"),
            )
            .orderBy("label")
        )
    finally:
        feats.unpersist()


QUERIES = {
    "train_test_split": train_test_split,
    "graph_train_epochs": graph_train_epochs,
    "graph_train_readout": graph_train_readout,
}

ORACLE = {
    "train_test_split": f"""
        SELECT vec_id,
               CAST(label AS BIGINT) AS label,
               CASE WHEN vec_id % {SPLIT_MOD} < {TRAIN_PARTS}
                    THEN 'train' ELSE 'test' END AS split
        FROM embeddings
    """,
    # graph_train_epochs / graph_train_readout: rows-only (learned state;
    # invariants pinned in tests/test_graph_train.py)
}
