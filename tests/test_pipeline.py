"""Property tests for the corpus-assembly pipeline operators
(llm/pipeline.py) — the invariants the SQL oracle can't express."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.llm.pipeline import (
    EVAL_MOD,
    SEQ_BUDGET,
    decontam_ngram,
    mix_weights,
    pack_sequences,
    sample_stratified,
)
from flink_streaming_gnn_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_stratified_sampling_is_partitioning_invariant(spark):
    """The kept set is a pure function of (doc_id, lang): identical under
    any repartitioning — the reproducibility property curation needs."""
    a = sample_stratified(spark, SF_SMOKE).toPandas()
    d2 = sample_stratified(spark, SF_SMOKE).repartition(17).toPandas()
    assert sorted(a["doc_id"]) == sorted(d2["doc_id"])
    # rates actually stratify: en keeps more than fr/de
    by_lang = a.groupby("lang").size()
    docs = load_table(spark, SF_SMOKE, "documents").toPandas().groupby("lang").size()
    keep_rate = (by_lang / docs).dropna()
    if {"en", "fr"} <= set(keep_rate.index):
        assert keep_rate["en"] > keep_rate["fr"]


def test_decontam_flags_planted_contamination(spark):
    """A training doc that IS an eval doc's text (the fixture has exact
    duplicate texts across ids) must be flagged; clean docs must not be."""
    d = load_table(spark, SF_SMOKE, "documents").toPandas()
    eval_texts = set(d[d.doc_id % EVAL_MOD == 0]["text"])
    train = d[d.doc_id % EVAL_MOD != 0]
    planted = {
        int(r.doc_id)
        for r in train.itertuples()
        if r.text in eval_texts and len(r.text.split()) >= 8
    }
    flagged = set(decontam_ngram(spark, SF_SMOKE).toPandas()["doc_id"])
    assert planted <= flagged, "exact eval-text copies must always be flagged"


def test_pack_sequences_fill_properties(spark):
    out = pack_sequences(spark, SF_SMOKE).toPandas()
    # every doc assigned exactly one sequence, ids contiguous from 0 per lang
    assert out["seq_id"].min() == 0
    for _, grp in out.groupby("lang"):
        seqs = sorted(grp["seq_id"].unique())
        assert seqs == list(range(len(seqs)))
        # contiguous fill: per sequence the token sum stays within budget +
        # one straddling doc (docs are not split here — chunking is upstream)
        per_seq = grp.groupby("seq_id")["n_tok"].sum()
        assert (per_seq <= SEQ_BUDGET + grp["n_tok"].max()).all()
        # deterministic in doc_id order: seq_id is monotone per lang
        ordered = grp.sort_values("doc_id")["seq_id"]
        assert (ordered.diff().dropna() >= 0).all()


def test_mix_weights_reshape_toward_uniform(spark):
    w = mix_weights(spark, SF_SMOKE).toPandas()
    assert (w["weight"] <= 1.0 + 1e-9).all()
    assert (w["weight"] > 0).all()
    # heavier sources get smaller weights (anti-correlation, allowing cap ties)
    big = w.loc[w["src_tokens"].idxmax()]
    small = w.loc[w["src_tokens"].idxmin()]
    assert big["weight"] <= small["weight"]
