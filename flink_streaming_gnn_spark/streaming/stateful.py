"""Arbitrary keyed streaming state — the reference's incremental
MeanAggregator (SURVEY.md §2A A6: per-vertex running {sum, count} with
``reduce(msg)`` on arrival and ``replace(old, new)`` retraction).

Spark-first: ``applyInPandasWithState`` keeps exactly that monoid in the
state store, per key, across micro-batches. ``reduce`` = add (+v, +1);
``replace`` = add the delta (+new−old, +0) — retraction needs no special
machinery because the state is a commutative group, which is the same
observation the reference's aggregator design rests on.

``incremental_mean_tws`` is the same operator on the Spark 4
``transformWithStateInPandas`` API (typed ValueState, timers, explicit
processor lifecycle) — the forward path for new stateful operators; both
are pinned to the same batch twin in tests.
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


def incremental_mean_tws(stream_df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """A6 on the Spark 4 ``transformWithStateInPandas`` API: the running
    {sum, count} monoid lives in a typed ValueState; each micro-batch folds
    its rows in and emits the key's current state. Functionally identical
    to ``incremental_mean`` (same batch twin); this API adds typed state,
    timers and TTL for operators that need them (session GC, as-of
    retention).

    NOTE: the TWS Python runner requires ``google.protobuf``, which this
    container lacks — the operator is import-clean and plan-builds, and its
    end-to-end test skips when protobuf is unavailable
    (tests/test_streaming.py). ``incremental_mean`` (applyInPandasWithState)
    is the fully-exercised production path here."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class MeanProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("sc", "s double, c long")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            if self._state.exists():
                s, c = self._state.get()
            else:
                s, c = 0.0, 0
            for pdf in rows:
                s += float(pdf[value_col].sum())
                c += int(len(pdf))
            self._state.update((s, c))
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "running_sum": [s],
                    "running_count": [c],
                    "running_mean": [s / c if c else None],
                }
            )

        def close(self) -> None:
            pass

    return stream_df.groupBy(key_col).transformWithStateInPandas(
        MeanProcessor(),
        outputStructType="key long, running_sum double, running_count long, running_mean double",
        outputMode="Update",
        timeMode="None",
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


def incremental_decayed_sum(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    tau_seconds: float,
) -> DataFrame:
    """TGN-style exponentially time-decayed per-key memory (the streaming
    form of ``graph/temporal.graph_time_decayed_agg``): on each event,

        state = state · exp(-(t − t_last)/τ) + v

    folded in event-time order within each micro-batch. Because
    exponential decay composes (``exp(-(a+b)) = exp(-a)·exp(-b)``), the
    final state equals the batch closed form
    ``Σ v_i · exp(-(T_last − t_i)/τ)`` REGARDLESS of how the stream was
    micro-batched — the batch≡stream property pinned in tests. Events
    with equal timestamps decay by exp(0)=1 between each other, so no
    tiebreak is needed for determinism.

    Emits (key, decayed_sum, last_ts_epoch) per key per micro-batch; the
    run's final emission per key (max last_ts_epoch) is the final memory.
    """

    def update(key, pdf_iter, state: GroupState):
        import math

        import pandas as pd

        if state.exists:
            acc, last = state.get
        else:
            acc, last = 0.0, None
        rows = pd.concat(list(pdf_iter)).sort_values(ts_col)
        for t, v in zip(rows[ts_col], rows[value_col]):
            ts = t.timestamp()
            if last is not None:
                acc *= math.exp(-(ts - last) / tau_seconds)
            acc += float(v)
            last = ts
        state.update((acc, float(last)))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "decayed_sum": [acc],
                "last_ts_epoch": [last],
            }
        )

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType="key long, decayed_sum double, last_ts_epoch double",
            stateStructType="acc double, last double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
