"""Arbitrary keyed streaming state — the reference's incremental
MeanAggregator (SURVEY.md §2A A6: per-vertex running {sum, count} with
``reduce(msg)`` on arrival and ``replace(old, new)`` retraction).

Spark-first: ``applyInPandasWithState`` keeps exactly that monoid in the
state store, per key, across micro-batches. ``reduce`` = add (+v, +1);
``replace`` = add the delta (+new−old, +0) — retraction needs no special
machinery because the state is a commutative group, which is the same
observation the reference's aggregator design rests on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def incremental_mean(stream_df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Running per-key mean over an unbounded keyed stream.

    Input: streaming DataFrame with (key_col, value_col [, delta_old]).
    If a ``delta_old`` column is present and non-null, the row is an
    UPDATE: the old value is retracted and value_col applied (A6
    ``replace``). Emits (key, running_sum, running_count, running_mean)
    once per key per micro-batch.
    """
    has_retract = "delta_old" in stream_df.columns

    def update(key, pdf_iter, state: GroupState):
        s, c = state.get if state.exists else (0.0, 0)  # .get is a property
        for pdf in pdf_iter:
            vals = pdf[value_col]
            s += float(vals.sum())
            if has_retract:
                old = pdf["delta_old"].dropna()
                s -= float(old.sum())
                c += int(len(pdf)) - int(len(old))
            else:
                c += int(len(pdf))
        state.update((s, c))
        import pandas as pd

        yield pd.DataFrame(
            {
                "key": [key[0]],
                "running_sum": [s],
                "running_count": [c],
                "running_mean": [s / c if c else None],
            }
        )

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType="key long, running_sum double, running_count long, running_mean double",
            stateStructType="s double, c long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def latest_state(stream_df: DataFrame, key_col: str, seq_col: str) -> DataFrame:
    """Streaming last-writer-wins GraphOp materialization (the stateful twin
    of graph/graphop.py ``graphop_materialize``): per key, keep the row
    with the highest ``seq_col`` seen so far — including REMOVE ops, so the
    consumer filters dead keys exactly like the batch window does.

    State per key is one (seq, op, value) triple — constant size, no log
    retention; the micro-batch pre-reduces before touching the state store.
    Emits the current winner per key per micro-batch (update mode).
    """

    def update(key, pdf_iter, state: GroupState):
        best_seq, best_op, best_val = (
            state.get if state.exists else (-1, None, None)
        )
        for pdf in pdf_iter:
            idx = pdf[seq_col].idxmax()  # pre-reduce the batch first
            row = pdf.loc[idx]
            if int(row[seq_col]) > best_seq:
                best_seq = int(row[seq_col])
                best_op = str(row["op"])
                best_val = float(row["feat_value"])
        state.update((best_seq, best_op, best_val))
        import pandas as pd

        yield pd.DataFrame(
            {
                "vertex": [key[0]],
                "seq": [best_seq],
                "op": [best_op],
                "feat_value": [best_val],
            }
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType="vertex long, seq long, op string, feat_value double",
        stateStructType="seq long, op string, v double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
