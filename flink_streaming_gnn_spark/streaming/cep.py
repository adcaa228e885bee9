"""Streaming CEP — the funnel-within-window pattern machine run as a
REAL multi-trigger stream (the 9th end-to-end streaming key). This is
the closest Spark analogue of FlinkCEP's ``A next B next C within(1h)``
NFA: per-user keyed state holds the OPEN pattern instances (views
awaiting their click, view→click chains awaiting their purchase),
advanced event-by-event in event-time order across micro-batch
boundaries, with window-expired instances pruned so state stays bounded
by the events one user emits per window — exactly Flink's CEP state
lifecycle, expressed on ``applyInPandasWithState``.

Equivalence to the batch operator (``operators/cep.cep_window_funnel``,
whose oracle SQL this key reuses verbatim): the batch semantics are
greedy earliest-next chaining — t2 = min click > t1, kept iff within
t1+W; t3 = min purchase > t2, kept iff within t1+W. Processing events
in nondecreasing event-time order makes greedy chaining INCREMENTAL:

* a click at time t matches every open view with t1 < t ≤ t1+W (that
  click IS each one's earliest later click, else they'd have matched
  already) and promotes them to open chains;
* a purchase at time t completes every open chain with t2 < t ≤ t1+W;
* an instance whose window has passed (t1+W < t) can never match again
  — strict inequalities only ever harden with growing t — so pruning
  it is pure state hygiene, not a semantic choice.

Replay order: ``events_stream`` chunks are event-time-range ordered
(replay.py), and all match conditions are STRICT inequalities, so
equal-timestamp events commute — the final state is replay-batching
independent, which is what lets the DuckDB oracle check a real stream.

Each trigger emits the key's final-if-ended-now summary in update mode;
the run's last emission per key (max events processed — monotone) is
the answer. A user with no view emits nothing, matching the batch
output's key set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from flink_streaming_gnn_spark.operators.cep import ORACLE as _BATCH_ORACLE
from flink_streaming_gnn_spark.operators.cep import STAGES, WINDOW_US


def funnel_state_machine(stream_df: DataFrame, window_us: int) -> DataFrame:
    """Per-user streaming funnel NFA.

    ROW-THINNING AND CODEC PREP HAPPEN JVM-SIDE (round-5 state/serde
    shave): events are filtered to the three funnel stages and projected
    to (user_id, us: long, stage: int) BEFORE entering Python — the
    non-funnel event types (the majority of the stream) never cross the
    Arrow boundary, and the per-key pandas work starts from int64/int32
    columns instead of re-decoding datetime64 and comparing strings per
    key. ``n_proc`` therefore counts FUNNEL events processed (still
    monotone per key, which is all its final-emission-selection role
    needs); users with no funnel events never invoke the state fn and
    never emit — the same key set as before, since only md ≥ 1 users
    produce output rows anyway.
    """
    stage_view, stage_click, stage_buy = STAGES
    prepped = stream_df.filter(
        F.col("event_type").isin([stage_view, stage_click, stage_buy])
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.when(F.col("event_type") == stage_view, F.lit(0))
        .when(F.col("event_type") == stage_click, F.lit(1))
        .otherwise(F.lit(2))
        .cast("int")
        .alias("stage"),
    )

    def update(key, pdf_iter, state: GroupState):
        """VECTORIZED batch advance (the ×10 probe measured the naive
        per-event Python loop at 162 s over 10M events — the NFA itself
        was the cost): because replay is event-time ordered and every
        match condition is a strict inequality, the greedy chain steps
        within one micro-batch reduce to ``searchsorted`` lookups against
        the batch's click/buy time arrays — a view's earliest later click
        is the batch's first click time > t1 (earlier batches had none,
        or the view would have matched already), and likewise for buys.
        Window expiry is applied at batch end against the batch max time
        (within-batch window checks live in the match conditions), which
        both prunes state and finalizes dead instances exactly as the
        per-event form did. Round-5 serde shave on top: inputs arrive as
        int64 µs + int stage codes (no per-key datetime/string decode),
        state arrays round-trip via ``ndarray.tolist()``, and the two
        output frame shapes are built once in the closure."""
        import numpy as np
        import pandas as pd

        if state.exists:
            md, nf, seen, p1, p2a, p2b = state.get
            p1 = np.asarray(p1, dtype=np.int64)
            p2a = np.asarray(p2a, dtype=np.int64)
            p2b = np.asarray(p2b, dtype=np.int64)
        else:
            md, nf, seen = 0, 0, 0
            p1 = np.empty(0, dtype=np.int64)
            p2a = np.empty(0, dtype=np.int64)
            p2b = np.empty(0, dtype=np.int64)
        chunks = list(pdf_iter)
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        us_all = rows["us"].to_numpy(dtype=np.int64, copy=False)
        st = rows["stage"].to_numpy()
        order = np.argsort(us_all, kind="stable")
        us_all = us_all[order]
        st = st[order]
        V = us_all[st == 0]
        C = us_all[st == 1]  # sorted (slices of a sorted array)
        B = us_all[st == 2]
        seen += len(us_all)
        if len(V):
            md = max(md, 1)
        # step 1: views (carried + new) meet the batch's clicks
        views = np.concatenate([p1, V])
        if len(C):
            idx = np.searchsorted(C, views, side="right")  # first click > t1
            has = idx < len(C)
            t2c = np.where(has, C[np.minimum(idx, len(C) - 1)], 0)
            chains = has & (t2c <= views + window_us)
            dead = has & ~chains  # earliest later click out of window
            p1 = views[~has]  # no later click yet: stays open
            new_a, new_b = views[chains], t2c[chains]
            if len(new_a):
                md = max(md, 2)
            p2a = np.concatenate([p2a, new_a])
            p2b = np.concatenate([p2b, new_b])
            del dead  # depth-1 finals; md already >= 1
        else:
            p1 = views
        # step 2: chains (carried + new) meet the batch's buys
        if len(B) and len(p2a):
            idx = np.searchsorted(B, p2b, side="right")  # first buy > t2
            has = idx < len(B)
            t3c = np.where(has, B[np.minimum(idx, len(B) - 1)], 0)
            done = has & (t3c <= p2a + window_us)
            dead = has & ~done  # earliest later buy out of window: depth 2
            if done.any():
                nf += int(done.sum())
                md = 3
            keep = ~has
            p2a, p2b = p2a[keep], p2b[keep]
        # end-of-batch window expiry (cross-batch pruning; monotone time)
        if len(us_all):
            horizon = int(us_all[-1])
            p1 = p1[p1 + window_us >= horizon]
            keep = p2a + window_us >= horizon
            p2a, p2b = p2a[keep], p2b[keep]
        state.update((md, nf, seen, p1.tolist(), p2a.tolist(), p2b.tolist()))
        if md == 0:  # no view yet: the batch output has no row for this key
            yield _EMPTY_OUT.copy(deep=False)
        else:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "max_depth": [md],
                    "n_full": [nf],
                    "n_proc": [seen],
                }
            )

    import pandas as _pd

    _EMPTY_OUT = _pd.DataFrame(
        {"user_id": [], "max_depth": [], "n_full": [], "n_proc": []}
    ).astype(
        {"user_id": "int64", "max_depth": "int32", "n_full": "int64", "n_proc": "int64"}
    )

    return prepped.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, max_depth int, n_full long, n_proc long",
        stateStructType=(
            "md int, nf long, seen long, "
            "p1 array<long>, p2a array<long>, p2b array<long>"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_cep_funnel_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drained through the update-mode parquet spool, not the driver
    memory sink — the state machine emits per key per micro-batch
    (~|keys|·|triggers| rows, linear in the corpus; 440 s at ×100 under
    the memory sink), and the monotone last-emission-wins readout below
    is a distributed window over the spool (VERDICT r8 #3)."""
    from flink_streaming_gnn_spark.streaming.replay import (
        events_stream,
        run_update_spooled,
    )

    stream = events_stream(spark, sf_dir, files_per_trigger=2).select(
        "user_id", "ts", "event_type"
    )
    out = run_update_spooled(
        funnel_state_machine(stream, WINDOW_US), "cep_funnel_e2e"
    )
    # final emission per key = the one that saw the most events (monotone)
    w = Window.partitionBy("user_id").orderBy(F.col("n_proc").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "max_depth", "n_full")
        .orderBy("user_id")
    )


QUERIES = {"stream_cep_funnel_e2e": stream_cep_funnel_e2e}
# the stream's final state must equal the batch funnel exactly — reuse its
# oracle verbatim
ORACLE = {"stream_cep_funnel_e2e": _BATCH_ORACLE["cep_window_funnel"]}
