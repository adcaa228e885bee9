"""Round-8 hardening tests.

1. `dedup_embedding_cosine_planted` — de-vacuates the base key's oracle
   row (VERDICT r7 "What's wrong" #1: 0 Spark rows = 0 oracle rows at
   sf0.01 proved nothing). The planted key must be non-empty at every
   fixture scale, with the planted structure exactly as documented.
2. Crash-recovery drill (VERDICT r7 "Next round" #5): the two flagship
   stateful streams killed after their first trigger and resumed from
   the checkpoint must reach the IDENTICAL final state as an
   uninterrupted drain, with exactly-once sink semantics across the
   restart (idempotent per-batch-id spool overwrite).
3. `source_rate_ingest` determinism (VERDICT r7 "Next round" #7).
"""

from __future__ import annotations

import math
import os
import tempfile
import time

import numpy as np
import pytest

from flink_streaming_gnn_spark.llm.dedup import (
    PLANT_CLONE_OFFSET,
    PLANT_PARITY_OFFSET,
    PLANT_SEED_MOD,
    dedup_embedding_cosine_planted,
)
from flink_streaming_gnn_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE

# global minimum of (1+t)/sqrt(1+3t) over t in [0,1], attained at t=1/3
_PARITY_COS_FLOOR = 2.0 * math.sqrt(2.0) / 3.0


@pytest.fixture(scope="module")
def planted(spark):
    return (
        dedup_embedding_cosine_planted(spark, SF_ORACLE)
        .toPandas()
        .sort_values(["group_a", "group_b"])
        .reset_index(drop=True)
    )


def test_planted_nonvacuous(spark, planted):
    """One self row AND one parity cross row per seed — non-empty by
    construction, unlike the base key's fixture-dependent output."""
    seeds = (
        load_table(spark, SF_ORACLE, "embeddings")
        .filter(f"vec_id % {PLANT_SEED_MOD} = 0")
        .select("vec_id")
        .toPandas()["vec_id"]
        .tolist()
    )
    assert len(seeds) >= 1
    for s in seeds:
        self_rows = planted[
            (planted.group_a == s) & (planted.group_b == s)
        ]
        assert len(self_rows) == 1, f"seed {s}: missing clone self row"
        assert self_rows.iloc[0]["n_a"] >= 2  # seed + exact clone
        cross = planted[
            (planted.group_a == s)
            & (planted.group_b == s + PLANT_PARITY_OFFSET)
        ]
        assert len(cross) == 1, f"seed {s}: missing parity cross row"


def test_planted_cross_cos_band(planted):
    """Parity cross pairs score (1+t)/sqrt(1+3t) ∈ [2√2/3, 1]; on real
    data (energy in both parities) strictly < 1 — a non-trivial cosine."""
    cross = planted[planted.group_a != planted.group_b]
    assert len(cross) >= 1
    parity_rows = cross[cross.group_b >= PLANT_PARITY_OFFSET]
    assert len(parity_rows) >= 1
    assert (parity_rows.cos >= round(_PARITY_COS_FLOOR, 4) - 1e-9).all()
    assert (parity_rows.cos <= 1.0).all()
    # the fixture's embeddings have energy at both parities → strictly < 1
    assert (parity_rows.cos < 1.0).all()


def test_planted_matches_brute_force(spark, planted):
    """Brute-force numpy parity on the planted corpus: exact group
    collapse + all-pairs double-precision cosine within label."""
    e = (
        load_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", "label", "embedding")
        .toPandas()
    )
    rows = list(
        e.itertuples(index=False, name=None)
    )  # (vec_id, label, emb)
    plants = []
    for vid, lbl, emb in rows:
        if vid % PLANT_SEED_MOD == 0:
            plants.append((vid + PLANT_CLONE_OFFSET, lbl, emb))
            v = np.asarray(emb, dtype=np.float32).copy()
            v[0::2] = (v[0::2].astype(np.float64) * 2.0).astype(np.float32)
            plants.append((vid + PLANT_PARITY_OFFSET, lbl, v))
    corpus = rows + plants
    groups: dict[tuple, list[int]] = {}
    for vid, lbl, emb in corpus:
        key = (lbl, tuple(np.asarray(emb, dtype=np.float32).tolist()))
        groups.setdefault(key, []).append(vid)
    reps = [
        (min(ids), lbl, np.asarray(emb, dtype=np.float64), len(ids))
        for (lbl, emb), ids in groups.items()
    ]
    expected = set()
    for rep_id, _lbl, _v, n in reps:
        if n >= 2:
            expected.add((rep_id, rep_id))
    for i in range(len(reps)):
        for j in range(len(reps)):
            ra, la, va, _na = reps[i]
            rb, lb, vb, _nb = reps[j]
            if la != lb or ra >= rb:
                continue
            cos = float(
                va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
            )
            if cos >= 0.9:
                expected.add((ra, rb))
    got = set(zip(planted.group_a.tolist(), planted.group_b.tolist()))
    assert got == expected


# ---------------------------------------------------------------------------
# Crash-recovery drill: stop after trigger 0, resume from the checkpoint.


def _run_one_trigger_then_stop(writer_start):
    """Start a processingTime-triggered stream (batch 0 fires
    immediately, batch 1 not for 100 s), wait for batch 0 to COMMIT
    (lastProgress posts after the commit), hard-stop. Returns nothing —
    the caller inspects the sink/checkpoint."""
    q = writer_start()
    deadline = time.time() + 120
    while q.lastProgress is None and time.time() < deadline:
        time.sleep(0.5)
    assert q.lastProgress is not None, "batch 0 never committed"
    q.stop()
    q.awaitTermination()


def test_scd2_crash_resume_identical(spark):
    """stream_scd2_e2e's machinery killed after trigger 0 and resumed
    from the checkpoint: closed-row spool AND state-store open tail must
    equal the uninterrupted run's, with every closed event_id emitted
    exactly once across the restart."""
    from pyspark.sql import functions as F

    from flink_streaming_gnn_spark.streaming.replay import (
        events_stream,
        run_update_spooled_with_state,
    )
    from flink_streaming_gnn_spark.streaming.scd2 import scd2_state_machine
    from tests.conftest import SF_SMOKE

    def stream():
        return events_stream(spark, SF_SMOKE, files_per_trigger=2).select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "event_id",
            "event_type",
        )

    def read_opens(ckpt: str):
        return sorted(
            (r["user_id"], r["event_id"], r["event_type"], r["vf_us"])
            for r in spark.read.format("statestore")
            .option("path", ckpt)
            .load()
            .select(
                F.col("key.user_id").alias("user_id"),
                F.col("value.groupState.o_eid").alias("event_id"),
                F.col("value.groupState.o_et").alias("event_type"),
                F.col("value.groupState.o_us").alias("vf_us"),
            )
            .collect()
        )

    with tempfile.TemporaryDirectory() as work:
        ckpt = os.path.join(work, "ckpt")
        spool = os.path.join(work, "spool")

        def sink(batch_df, batch_id):
            # idempotent per-batch-id target: a batch re-run after the
            # crash OVERWRITES its own output instead of double-appending
            # — the standard exactly-once foreachBatch discipline
            batch_df.write.mode("overwrite").parquet(
                os.path.join(spool, f"batch={batch_id}")
            )

        def writer(trigger_kwargs):
            return lambda: (
                scd2_state_machine(stream())
                .writeStream.outputMode("update")
                .foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(**trigger_kwargs)
                .start()
            )

        # phase 1: exactly one committed trigger, then hard stop
        _run_one_trigger_then_stop(writer({"processingTime": "100 seconds"}))
        n_partial = spark.read.parquet(spool).count()

        # phase 2: resume from the same checkpoint, drain the rest
        q2 = writer({"availableNow": True})()
        q2.awaitTermination()

        closed = spark.read.parquet(spool)
        closed_rows = sorted(
            (r["user_id"], r["event_id"], r["event_type"], r["vf_us"], r["vt_us"])
            for r in closed.select(
                "user_id", "event_id", "event_type", "vf_us", "vt_us"
            ).collect()
        )
        # exactly-once across the restart: event_id is unique per closed
        # interval, so any replay would surface as a duplicate
        ids = [r[1] for r in closed_rows]
        assert len(ids) == len(set(ids))
        opens_resumed = read_opens(ckpt)

    # uninterrupted reference run (fresh spool + kept checkpoint)
    ref_closed_df, ref_ckpt = run_update_spooled_with_state(
        scd2_state_machine(stream()), "scd2_r8_uninterrupted"
    )
    ref_closed = sorted(
        (r["user_id"], r["event_id"], r["event_type"], r["vf_us"], r["vt_us"])
        for r in ref_closed_df.select(
            "user_id", "event_id", "event_type", "vf_us", "vt_us"
        ).collect()
    )
    assert 0 < n_partial < len(ref_closed)  # phase 1 really was partial
    assert closed_rows == ref_closed  # resumed ≡ uninterrupted (closed)
    assert opens_resumed == read_opens(ref_ckpt)  # ... and (open tail)


def test_cc_crash_resume_identical(spark):
    """stream_cc_e2e's incremental state machinery killed after trigger 0
    and resumed: the final label summary must equal the uninterrupted
    registry key's. The drill's foreachBatch derives its prior state
    from DISK (latest committed version < batch_id), which is exactly
    what makes the resume correct: a re-run batch overwrites its own
    version directory and rebuilds from its true predecessor."""
    from pyspark.sql import functions as F

    from flink_streaming_gnn_spark.streaming.graphcc import (
        edges_stream,
        merge_batch,
        stream_cc_e2e,
    )
    from tests.conftest import SF_SMOKE

    def summarize(labels):
        return sorted(
            (r["lbl"], r["n"])
            for r in labels.groupBy("lbl")
            .agg(F.count("*").cast("long").alias("n"))
            .collect()
        )

    with tempfile.TemporaryDirectory() as work:
        ckpt = os.path.join(work, "ckpt")
        state_root = os.path.join(work, "state")
        os.makedirs(state_root)

        def latest_version_below(batch_id):
            versions = [
                int(d[1:])
                for d in os.listdir(state_root)
                if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < batch_id
            ]
            return max(versions) if versions else None

        def apply_batch(batch_df, batch_id):
            b = (
                batch_df.select(
                    (F.col("src") * 2).alias("a"),
                    (F.col("dst") * 2 + 1).alias("b"),
                )
                .distinct()
            )
            und = b.union(b.select(F.col("b").alias("a"), F.col("a").alias("b")))
            v = latest_version_below(batch_id)
            prior = (
                spark.read.parquet(os.path.join(state_root, f"v{v}"))
                if v is not None
                else None
            )
            labels = merge_batch(prior, und)
            labels.write.mode("overwrite").parquet(
                os.path.join(state_root, f"v{batch_id}")
            )

        def writer(trigger_kwargs):
            return lambda: (
                edges_stream(spark, SF_SMOKE)
                .writeStream.foreachBatch(apply_batch)
                .option("checkpointLocation", ckpt)
                .trigger(**trigger_kwargs)
                .start()
            )

        _run_one_trigger_then_stop(writer({"processingTime": "100 seconds"}))
        versions_after_phase1 = sorted(os.listdir(state_root))

        q2 = writer({"availableNow": True})()
        q2.awaitTermination()

        final_v = max(int(d[1:]) for d in os.listdir(state_root))
        assert f"v{final_v}" not in versions_after_phase1  # resume advanced
        resumed = summarize(
            spark.read.parquet(os.path.join(state_root, f"v{final_v}"))
        )

    reference = sorted(
        (r["component"], r["n_vertices"])
        for r in stream_cc_e2e(spark, SF_SMOKE)
        .select("component", "n_vertices")
        .collect()
    )
    assert resumed == reference


def test_source_rate_ingest_deterministic(spark):
    from flink_streaming_gnn_spark.streaming.sources import source_rate_ingest

    a = source_rate_ingest(spark, "ignored").toPandas()
    assert len(a) == 200
    assert sorted(a.event_id.tolist()) == list(range(200))
    # per-element str(), the driver-canon form (Series.astype(str) trims
    # midnight timestamps to date-only, which the driver does not)
    assert {str(v) for v in a.ts} == {"1970-01-01 00:00:00"}
    assert a.loc[a.event_id == 7, "event_type"].iloc[0] == "type_2"
    assert a.loc[a.event_id == 7, "value"].iloc[0] == 3.5
    assert a.loc[a.event_id == 7, "props"].iloc[0] == '{"seq":7}'


# ---------------------------------------------------------------------------
# Component-blocked triangle tiers (round 8 — the ×100 probe killed the
# oriented-join tier on quasi-clique components; see graph/triangles.py).


def _pv_truth(spark, e):
    """Whole-graph dense-kernel truth: {v: (degree, tri)}."""
    from flink_streaming_gnn_spark.graph.clustering import _per_vertex_dense

    pdf = e.toPandas()
    return {
        v: (d, t)
        for v, d, t in _per_vertex_dense(
            pdf["a"].to_numpy(), pdf["b"].to_numpy()
        )
    }


def test_component_split_invariants(spark):
    """dense_e edges are label-closed, vertex sets are disjoint between
    tiers, and no edge is lost."""
    from pyspark.sql import functions as F

    from flink_streaming_gnn_spark.graph.triangles import (
        _split_components,
        _supplier_edges,
    )
    from tests.conftest import SF_SMOKE

    e = _supplier_edges(spark, SF_SMOKE).localCheckpoint()
    dense_e, sparse_e = _split_components(e)
    n_e = e.count()
    n_dense, n_sparse = dense_e.count(), sparse_e.count()
    assert n_dense + n_sparse == n_e
    dv = {
        r["v"]
        for r in dense_e.select(
            F.explode(F.array("a", "b")).alias("v")
        ).distinct().collect()
    }
    sv = {
        r["v"]
        for r in sparse_e.select(
            F.explode(F.array("a", "b")).alias("v")
        ).distinct().collect()
    }
    assert not (dv & sv)  # a vertex lives in exactly one tier


def test_component_tiers_match_dense_truth(spark):
    """The component-blocked union (executor BLAS + sparse joins) must
    reproduce the whole-graph dense kernel exactly — at the natural
    component bound, with everything FORCED sparse, and with everything
    forced dense."""
    import flink_streaming_gnn_spark.graph.triangles as tri_mod
    from flink_streaming_gnn_spark.graph.triangles import (
        _dense_component_pv,
        _per_vertex_joins,
        _split_components,
        _supplier_edges,
    )
    from tests.conftest import SF_SMOKE

    e = _supplier_edges(spark, SF_SMOKE).localCheckpoint()
    truth = _pv_truth(spark, e)

    def run_split():
        dense_e, sparse_e = _split_components(e)
        got = {}
        for r in _dense_component_pv(dense_e).collect():
            got[r["v"]] = (r["degree"], r["tri"])
        for r in _per_vertex_joins(sparse_e).collect():
            got[r["v"]] = (r["degree"], r["tri"])
        return got

    assert run_split() == truth  # natural bound
    old = tri_mod.DENSE_COMPONENT_V_BOUND
    try:
        tri_mod.DENSE_COMPONENT_V_BOUND = 0  # force all-sparse
        assert run_split() == truth
        tri_mod.DENSE_COMPONENT_V_BOUND = 1 << 30  # force all-dense
        assert run_split() == truth
    finally:
        tri_mod.DENSE_COMPONENT_V_BOUND = old


def test_triangle_keys_forced_distributed_tier(spark, monkeypatch):
    """Both registry keys, FORCED onto the distributed component path
    (global dense bounds patched to 0), must equal their dense-tier
    fixture answers row for row."""
    import flink_streaming_gnn_spark.graph.clustering as clu_mod
    import flink_streaming_gnn_spark.graph.triangles as tri_mod
    from tests.conftest import SF_SMOKE

    def tri_rows():
        return sorted(
            tuple(r)
            for r in tri_mod.graph_triangle_count(spark, SF_SMOKE).collect()
        )

    def clu_rows():
        return sorted(
            tuple(r)
            for r in clu_mod.graph_clustering_coefficient(
                spark, SF_SMOKE
            ).collect()
        )

    want_tri, want_clu = tri_rows(), clu_rows()
    monkeypatch.setattr(tri_mod, "DENSE_V_BOUND", 0)
    monkeypatch.setattr(tri_mod, "DENSE_E_BOUND", 0)
    monkeypatch.setattr(clu_mod, "DENSE_V_BOUND", 0)
    monkeypatch.setattr(clu_mod, "DENSE_E_BOUND", 0)
    assert tri_rows() == want_tri
    assert clu_rows() == want_clu
