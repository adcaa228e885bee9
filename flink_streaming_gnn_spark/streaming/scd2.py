"""Streaming SCD2 (slowly-changing-dimension type-2) history maintenance
— the 13th end-to-end streaming key. Every event is a change record for
its user; the operator maintains per-user VALIDITY INTERVALS across
micro-batch boundaries: the arrival of a change CLOSES the previously
open record (valid_to = the new change's ts) and opens a new current
one. This is the warehouse-standard dimension-history shape
(Kimball SCD type 2), run as a real multi-trigger stream on
``applyInPandasWithState`` — the streaming twin of the batch
``scd2_intervals`` (operators/seasonal.py), whose DuckDB oracle this
key reuses verbatim.

Replay-batching independence: closed rows are immutable facts — an
interval (event_id, valid_from, valid_to) is identical however the
stream is chunked, because the replay chunks are (ts, event_id)
range-ordered (replay.py), so the cross-batch successor of a record is
the same event the batch twin's ``lead()`` picks. The per-batch
emission is newly-closed rows plus the key's currently-open row (update
mode re-emits an open row that a later batch closes), so the final
answer selects, per (user_id, event_id), the CLOSED version if one
exists — closed rows are emitted exactly once, and stale open
emissions are superseded deterministically.

Timestamps cross the Arrow boundary as µs longs (the ``streaming/cep``
codec discipline); formatting back to the oracle's string form happens
JVM-side after the sink, so the Python path never touches datetime
objects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from flink_streaming_gnn_spark.operators.seasonal import ORACLE as _BATCH_ORACLE


def scd2_state_machine(stream_df: DataFrame) -> DataFrame:
    """Per-user open-interval state over (user_id, us, event_id,
    event_type); emits closed intervals plus the open one each batch."""

    def update(key, pdf_iter, state: GroupState):
        """Fully vectorized (the ×10 probe measured the per-row Python
        list loop at 121 s over 10M events): sort once, prepend the open
        state row, and the closing timestamps are just the µs array
        shifted by one — no per-element Python. The open tail's NULL
        valid_to rides a nullable Int64 column."""
        import numpy as np
        import pandas as pd

        chunks = list(pdf_iter)
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        us = rows["us"].to_numpy(dtype=np.int64, copy=False)
        eid = rows["event_id"].to_numpy(dtype=np.int64, copy=False)
        et = rows["event_type"].to_numpy()
        order = np.lexsort((eid, us))  # by (us, event_id)
        us, eid, et = us[order], eid[order], et[order]
        if state.exists:
            o_eid, o_us, o_et = state.get
            us = np.concatenate(([o_us], us))
            eid = np.concatenate(([o_eid], eid))
            et = np.concatenate(([o_et], et))
        vt = pd.array(np.concatenate((us[1:], [0])), dtype="Int64")
        vt[-1] = pd.NA  # the open (current) record — re-emitted until a
        # later batch closes it; the final selection supersedes it
        state.update((int(eid[-1]), int(us[-1]), str(et[-1])))
        yield pd.DataFrame(
            {
                "user_id": np.full(len(us), key[0], dtype=np.int64),
                "event_id": eid,
                "event_type": et,
                "vf_us": us,
                "vt_us": vt,
            }
        )

    return stream_df.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, event_id long, event_type string, "
            "vf_us long, vt_us long"
        ),
        stateStructType="o_eid long, o_us long, o_et string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_scd2_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_streaming_gnn_spark.streaming.replay import (
        events_stream,
        run_update_spooled,
    )

    stream = events_stream(spark, sf_dir, files_per_trigger=2).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        "event_type",
    )
    # event-sized emission → parquet spool, not the driver memory sink
    # (x10 probe: the memory sink alone cost ~90 s at 10M rows)
    out = run_update_spooled(scd2_state_machine(stream), "scd2_e2e")
    # per (user_id, event_id): the closed version wins (emitted exactly
    # once); open re-emissions are bit-identical to each other, so the
    # row_number pick needs no distinct() pre-pass — one shuffle, not two
    w = Window.partitionBy("user_id", "event_id").orderBy(
        F.col("vt_us").asc_nulls_last()
    )
    picked = out.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return picked.select(
        "user_id",
        "event_id",
        "event_type",
        F.date_format(F.timestamp_micros(F.col("vf_us")), "yyyy-MM-dd HH:mm:ss").alias(
            "valid_from"
        ),
        F.date_format(F.timestamp_micros(F.col("vt_us")), "yyyy-MM-dd HH:mm:ss").alias(
            "valid_to"
        ),
        F.col("vt_us").isNull().alias("is_current"),
    ).orderBy("user_id", "event_id")


QUERIES = {"stream_scd2_e2e": stream_scd2_e2e}
# final history == the batch SCD2 intervals — reuse its oracle verbatim
# (ordering differs only in presentation; the driver compare is
# order-insensitive)
ORACLE = {"stream_scd2_e2e": _BATCH_ORACLE["scd2_intervals"]}
