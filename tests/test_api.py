"""GraphPipeline facade: the job-level composition surface must return
exactly the operators the registry checks — no parallel semantics."""

from __future__ import annotations

import pytest

from flink_streaming_gnn_spark.api import GraphPipeline
from tests.conftest import SF_SMOKE


def _same(df_a, df_b):
    pa = df_a.toPandas()
    pb = df_b.toPandas()
    cols = sorted(pa.columns)
    assert cols == sorted(pb.columns)
    ra = sorted(map(tuple, pa[cols].astype(str).itertuples(index=False, name=None)))
    rb = sorted(map(tuple, pb[cols].astype(str).itertuples(index=False, name=None)))
    assert ra == rb


def test_layers_match_registry_ops(spark):
    from flink_streaming_gnn_spark.graph.gcn import graph_gcn_layer
    from flink_streaming_gnn_spark.graph.sage import graph_sage_layer

    p = GraphPipeline(spark, SF_SMOKE)
    _same(p.layers(1, "sage").embeddings(), graph_sage_layer(spark, SF_SMOKE))
    _same(p.layers(1, "gcn").embeddings(), graph_gcn_layer(spark, SF_SMOKE))


def test_partitioners_match_registry_ops(spark):
    from flink_streaming_gnn_spark.graph.ops import graph_partition_assign

    _same(
        GraphPipeline(spark, SF_SMOKE).with_partitioner("hash").partitions(),
        graph_partition_assign(spark, SF_SMOKE),
    )


def test_invalid_configs_rejected(spark):
    p = GraphPipeline(spark, SF_SMOKE)
    with pytest.raises(ValueError):
        p.layers(2, "gcn")
    with pytest.raises(ValueError):
        p.layers(3)
    with pytest.raises(ValueError):
        p.with_partitioner("range")
