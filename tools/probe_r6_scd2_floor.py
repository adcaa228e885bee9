"""Machinery-split measurement for stream_scd2_e2e at the x10 corpus:
(a) ingest-only applyInPandasWithState (state update, ZERO emission) --
the irreducible Arrow cost of pushing every event through the Python
state operator; (b) the full rewritten query for comparison."""
import sys, time
sys.path.insert(0, '/root/repo')
from flink_streaming_gnn_spark.session import get_spark
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

spark = get_spark("scd2_floor")
spark.sparkContext.setLogLevel("ERROR")
blown = "/tmp/graft_blown_1dd139f27c53"

from flink_streaming_gnn_spark.streaming.replay import events_stream, run_update_spooled

def ingest_only(stream_df):
    def update(key, pdf_iter, state: GroupState):
        import numpy as np, pandas as pd
        chunks = list(pdf_iter)
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        us = rows["us"].to_numpy(dtype=np.int64, copy=False)
        eid = rows["event_id"].to_numpy(dtype=np.int64, copy=False)
        i = int(np.lexsort((eid, us))[-1])
        state.update((int(eid[i]), int(us[i]), "x"))
        yield pd.DataFrame({"user_id": np.empty(0, dtype=np.int64),
                            "event_id": np.empty(0, dtype=np.int64),
                            "event_type": np.array([], dtype=object),
                            "vf_us": np.empty(0, dtype=np.int64),
                            "vt_us": np.empty(0, dtype=np.int64)})
    return stream_df.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, event_id long, event_type string, vf_us long, vt_us long",
        stateStructType="o_eid long, o_us long, o_et string",
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout)

stream = events_stream(spark, blown, files_per_trigger=2).select(
    "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    "event_id", "event_type")
t0 = time.perf_counter()
out = run_update_spooled(ingest_only(stream), "scd2_floor")
out.count()
print(f"ingest-only floor: {time.perf_counter()-t0:.1f}s", flush=True)

from flink_streaming_gnn_spark.streaming.scd2 import stream_scd2_e2e
t0 = time.perf_counter()
stream_scd2_e2e(spark, blown).write.format("noop").mode("overwrite").save()
print(f"full query: {time.perf_counter()-t0:.1f}s", flush=True)
