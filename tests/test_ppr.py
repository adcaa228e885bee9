"""Personalized PageRank: the seeded Spark power iteration must match a
numpy reference (same rounds, damping, seed-targeted teleport + dangling
return) to float tolerance, conserve probability mass, and stay zero off
the seeds' reachable set."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.graph.edges import derive_edges
from flink_streaming_gnn_spark.graph.ppr import (
    DAMPING,
    ROUNDS,
    SEED_MOD,
    graph_ppr_seeded,
    ppr_ranks,
)
from tests.conftest import SF_SMOKE


def _numpy_reference(spark) -> dict[int, float]:
    e = (
        derive_edges(spark, SF_SMOKE)
        .select((F.col("src") * 2).alias("a"), (F.col("dst") * 2 + 1).alias("b"))
        .distinct()
        .toPandas()
    )
    verts = sorted(set(e["a"]) | set(e["b"]))
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    seeds = [v for v in verts if v % SEED_MOD == 0]
    ns = len(seeds)
    seed_mask = np.zeros(n)
    for s in seeds:
        seed_mask[idx[s]] = 1.0
    out_deg = e.groupby("a").size()
    rank = seed_mask / ns
    for _ in range(ROUNDS):
        contrib = np.zeros(n)
        ra = rank[[idx[a] for a in e["a"]]] / out_deg[e["a"]].to_numpy()
        np.add.at(contrib, [idx[b] for b in e["b"]], ra)
        dangling = sum(rank[idx[v]] for v in verts if v not in out_deg.index)
        rank = (
            seed_mask * ((1.0 - DAMPING) / ns + DAMPING * dangling / ns)
            + DAMPING * contrib
        )
    return {v: rank[idx[v]] for v in verts}


def test_ppr_matches_numpy_reference(spark):
    truth = _numpy_reference(spark)
    got = {int(r["v"]): float(r["rank"]) for r in ppr_ranks(spark, SF_SMOKE).collect()}
    assert set(got) == set(truth)
    assert max(abs(got[v] - truth[v]) for v in truth) < 1e-9
    # mass conservation: teleport returns all leaked mass to the seeds
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_ppr_locality_and_summary(spark):
    got = ppr_ranks(spark, SF_SMOKE).toPandas()
    seeds = set(got.loc[got["v"] % SEED_MOD == 0, "v"])
    assert seeds, "fixture must contain at least one seed"
    top = graph_ppr_seeded(spark, SF_SMOKE).toPandas()
    assert (top["rank"].to_numpy() == np.sort(top["rank"].to_numpy())[::-1]).all()
    assert (top["rank"] > 0).all()
    # personalization: every seed holds positive mass (teleport floor)
    seed_ranks = got[got["v"].isin(seeds)]["rank"]
    assert (seed_ranks >= (1.0 - DAMPING) / len(seeds) - 1e-12).all()
