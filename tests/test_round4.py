"""Round-4 operator invariants — properties the sf0.01 oracle differential
(tests/test_oracle_differential.py, which auto-covers every new key) can't
express: determinism across runs, structural bounds, and equivalence of the
scale-rewrite plans to their naive forms.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.projection import (
    TOP_SUPPLIERS,
    graph_bipartite_projection,
    graph_reciprocity,
)
from flink_streaming_gnn_spark.llm.sampling import (
    SAMPLE_K,
    sample_priority_hash,
    text_winnowing_fingerprint,
    WIN_K,
    WIN_W,
)
from flink_streaming_gnn_spark.operators.behavior import (
    event_transition_matrix,
    user_rfm_segments,
)
from flink_streaming_gnn_spark.operators.layout import (
    EPS,
    PROBE_MOD,
    Z_BITS,
    join_band_epsilon,
    sink_zorder_layout,
)
from flink_streaming_gnn_spark.operators.robust import (
    FRAME,
    agg_weighted_median,
    ts_rolling_median,
    ts_sax_symbolize,
)
from flink_streaming_gnn_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# graph/projection.py


def test_reciprocity_bounds(spark):
    rows = graph_reciprocity(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_recip"] <= r["out_deg"]
    # every reciprocated ordered edge has its mirror counted too
    assert sum(r["n_recip"] for r in rows) % 2 == 0


def test_bipartite_projection_share_bound(spark):
    rows = graph_bipartite_projection(spark, SF_SMOKE).collect()
    assert rows
    # a pair can share at most TOP_SUPPLIERS suppliers — each side only
    # keeps that many edges, so the degree bound is visible in the output
    assert max(r["n_shared"] for r in rows) <= TOP_SUPPLIERS
    assert all(r["a"] < r["b"] for r in rows)


# ---------------------------------------------------------------------------
# operators/robust.py


def test_rolling_median_matches_pandas(spark):
    got = (
        ts_rolling_median(spark, SF_SMOKE)
        .orderBy("event_id")
        .toPandas()
    )
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_id", "user_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    expect = (
        ev.groupby("user_id")["value"]
        .rolling(FRAME, min_periods=1)
        .median()
        .reset_index(level=0, drop=True)
    )
    ev["roll_med"] = expect.round(6)
    merged = got.merge(
        ev[["event_id", "roll_med"]], on="event_id", suffixes=("", "_pd")
    )
    assert (merged["roll_med"] - merged["roll_med_pd"]).abs().max() < 1e-9


def test_weighted_median_hand(spark):
    got = {
        r["l_returnflag"]: r["w_median"]
        for r in agg_weighted_median(spark, SF_SMOKE).collect()
    }
    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .toPandas()
    )
    for flag, grp in li.groupby("l_returnflag"):
        g = grp.sort_values("l_extendedprice")
        half = g["l_quantity"].sum() / 2
        cum = g["l_quantity"].cumsum()
        expect = g.loc[cum >= half, "l_extendedprice"].iloc[0]
        assert got[flag] == expect


def test_sax_word_shape(spark):
    rows = ts_sax_symbolize(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert len(r["sax_word"]) == r["n_events"]
        assert set(r["sax_word"]) <= set("abcd")


# ---------------------------------------------------------------------------
# operators/behavior.py


def test_transition_matrix_is_stochastic(spark):
    pdf = event_transition_matrix(spark, SF_SMOKE).toPandas()
    sums = pdf.groupby("prev_type")["p"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all()
    ev = load_table(spark, SF_SMOKE, "events")
    n_pairs = ev.count() - ev.select("user_id").distinct().count()
    assert pdf["n"].sum() == n_pairs


def test_rfm_tiles_balanced(spark):
    pdf = user_rfm_segments(spark, SF_SMOKE).toPandas()
    for col in ("r_score", "f_score", "m_score"):
        counts = pdf[col].value_counts()
        assert set(counts.index) <= {1, 2, 3, 4}
        assert counts.max() - counts.min() <= 1


# ---------------------------------------------------------------------------
# operators/layout.py


def test_zorder_buckets_are_tight_rectangles(spark):
    """Each 1024-code bucket fixes the top 3 bits of both quantized dims,
    so per-bucket extents are ≤ 32 of 256 quantization cells per dim."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    b = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).first()
    xmin, xmax, ymin, ymax = b
    cell_x = (xmax - xmin + 1) / (1 << Z_BITS)
    cell_y = (ymax - ymin + 1) / (1 << Z_BITS)
    rows = sink_zorder_layout(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert (r["max_ok"] - r["min_ok"]) <= 33 * cell_x
        assert (r["max_pk"] - r["min_pk"]) <= 33 * cell_y


def test_band_join_equals_naive_theta(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "value")
    p = ev.filter(F.col("event_id") % PROBE_MOD == 0).select(
        F.col("event_id").alias("probe_id"), F.col("value").alias("pv")
    )
    naive = (
        ev.crossJoin(p)
        .filter(
            (F.abs(F.col("value") - F.col("pv")) <= EPS)
            & (F.col("event_id") != F.col("probe_id"))
        )
        .groupBy("probe_id")
        .agg(F.count("*").alias("n_within"))
    )
    got = {
        r["probe_id"]: r["n_within"]
        for r in join_band_epsilon(spark, SF_SMOKE).collect()
    }
    expect = {r["probe_id"]: r["n_within"] for r in naive.collect()}
    assert got == expect


# ---------------------------------------------------------------------------
# llm/sampling.py


def test_priority_sample_deterministic_and_stratified(spark):
    a = sample_priority_hash(spark, SF_SMOKE).collect()
    b = sample_priority_hash(spark, SF_SMOKE).collect()
    assert a == b  # pure function of the rows — no rand()
    pdf = pd.DataFrame([r.asDict() for r in a])
    per_src = pdf.groupby("source").size()
    assert (per_src <= SAMPLE_K).all()
    assert (pdf["rk"] >= 1).all() and (pdf["rk"] <= SAMPLE_K).all()


def test_winnowing_density_and_guarantee(spark):
    fps = text_winnowing_fingerprint(spark, SF_SMOKE).toPandas()
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", F.length("text").alias("n"))
        .toPandas()
    )
    merged = fps.groupby("doc_id").size().rename("n_fp").reset_index().merge(docs)
    # density: winnowing picks ≥ ceil(windows / w) distinct mins and ≤ windows
    for _, r in merged.iterrows():
        n_windows = r["n"] - (WIN_K - 1) - (WIN_W - 1)
        if n_windows > 0:
            assert 1 <= r["n_fp"] <= n_windows
            assert r["n_fp"] >= n_windows // (2 * WIN_W)
    # guarantee: two docs sharing a substring of length ≥ w+k−1 share a
    # fingerprint (construct the overlap directly from the corpus text)
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .limit(2)
        .collect()
    }
    ids = sorted(texts)
    if len(ids) == 2:
        t0 = texts[ids[0]]
        shared = t0[: WIN_K + WIN_W - 1]
        if len(shared) == WIN_K + WIN_W - 1 and shared in texts[ids[1]]:
            s0 = set(fps[fps.doc_id == ids[0]]["fp"])
            s1 = set(fps[fps.doc_id == ids[1]]["fp"])
            assert s0 & s1
