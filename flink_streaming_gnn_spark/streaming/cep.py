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
    """Per-user streaming funnel NFA over (user_id, ts, event_type)."""
    stage_view, stage_click, stage_buy = STAGES

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.exists:
            md, nf, seen, p1, p2a, p2b = state.get
            p1, p2a, p2b = list(p1), list(p2a), list(p2b)
        else:
            md, nf, seen, p1, p2a, p2b = 0, 0, 0, [], [], []
        rows = pd.concat(list(pdf_iter)).sort_values("ts")
        us_arr = rows["ts"].astype("datetime64[us]").astype("int64")
        for us, etype in zip(us_arr, rows["event_type"]):
            us = int(us)
            # prune window-expired open instances (monotone t ⇒ final)
            p1 = [t1 for t1 in p1 if t1 + window_us >= us]
            keep = [i for i, t1 in enumerate(p2a) if t1 + window_us >= us]
            p2a = [p2a[i] for i in keep]
            p2b = [p2b[i] for i in keep]
            if etype == stage_view:
                p1.append(us)
                md = max(md, 1)
            elif etype == stage_click:
                matched = [t1 for t1 in p1 if t1 < us <= t1 + window_us]
                if matched:
                    p1 = [t1 for t1 in p1 if not (t1 < us <= t1 + window_us)]
                    p2a.extend(matched)
                    p2b.extend([us] * len(matched))
                    md = max(md, 2)
            elif etype == stage_buy:
                done = [
                    i
                    for i, (t1, t2) in enumerate(zip(p2a, p2b))
                    if t2 < us <= t1 + window_us
                ]
                if done:
                    nf += len(done)
                    md = 3
                    alive = [i for i in range(len(p2a)) if i not in set(done)]
                    p2a = [p2a[i] for i in alive]
                    p2b = [p2b[i] for i in alive]
            seen += 1
        state.update((md, nf, seen, p1, p2a, p2b))
        if md == 0:  # no view yet: the batch output has no row for this key
            yield pd.DataFrame(
                {"user_id": [], "max_depth": [], "n_full": [], "n_proc": []}
            ).astype({"user_id": "int64", "max_depth": "int32", "n_full": "int64", "n_proc": "int64"})
        else:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "max_depth": [md],
                    "n_full": [nf],
                    "n_proc": [seen],
                }
            )

    return stream_df.groupBy("user_id").applyInPandasWithState(
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
    from flink_streaming_gnn_spark.streaming.replay import (
        events_stream,
        run_update_to_completion,
    )

    stream = events_stream(spark, sf_dir, files_per_trigger=2).select(
        "user_id", "ts", "event_type"
    )
    out = run_update_to_completion(
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
