"""User-facing pipeline facade — the reference's *job* shape as one fluent
entry point (SURVEY.md §3: a flink-streaming-gnn user assembles
source → partitioner → storage/GNN layers → readout/sink; a user
switching to this engine assembles the same pipeline here and gets the
oracle-checked operators underneath).

    from flink_streaming_gnn_spark.api import GraphPipeline

    emb = GraphPipeline(spark, sf_dir).layers(2, arch="sage").embeddings()
    parts = GraphPipeline(spark, sf_dir).with_partitioner("hdrf").partitions()
    scores = GraphPipeline(spark, sf_dir).train_readout().scores()
    winemb = GraphPipeline(spark, sf_dir).windowed().embeddings()

Every method returns the SAME DataFrames as the registry keys
(graph_sage_layer, graph_hdrf_partition, graph_train_readout, …), so
anything assembled here is automatically covered by the driver's
correctness gate — the facade adds zero new semantics, only the job-level
composition surface. Equality with the direct operator calls is pinned in
tests/test_api.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ARCHS = ("sage", "gcn", "gin", "gat")
_PARTITIONERS = ("hash", "hdrf")


class GraphPipeline:
    """Fluent builder over the engine's graph operators. Stateless between
    calls — each terminal method derives its DataFrame from the declared
    configuration; nothing executes until the caller acts on the result."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._arch = "sage"
        self._n_layers = 1
        self._partitioner = "hash"
        self._windowed = False
        self._epochs: int | None = None

    def with_partitioner(self, kind: str = "hash") -> "GraphPipeline":
        if kind not in _PARTITIONERS:
            raise ValueError(f"partitioner must be one of {_PARTITIONERS}")
        self._partitioner = kind
        return self

    def layers(self, n: int = 1, arch: str = "sage") -> "GraphPipeline":
        if arch not in _ARCHS:
            raise ValueError(f"arch must be one of {_ARCHS}")
        if n not in (1, 2):
            raise ValueError("1 or 2 layers supported")
        if n == 2 and arch != "sage":
            raise ValueError("2-layer chain is the SAGE path (graph_sage_2layer)")
        self._arch, self._n_layers = arch, n
        return self

    def windowed(self) -> "GraphPipeline":
        """Windowed forward (reference A8): per-(event-time window, vertex)
        coalesced aggregation before the tensor batch. SAGE only."""
        self._windowed = True
        return self

    def train_readout(self, epochs: int | None = None) -> "GraphPipeline":
        self._epochs = epochs if epochs is not None else -1
        return self

    # -- terminals ---------------------------------------------------------

    def partitions(self) -> DataFrame:
        """Vertex → part assignment under the declared partitioner."""
        if self._partitioner == "hdrf":
            from flink_streaming_gnn_spark.graph.hdrf import graph_hdrf_partition

            return graph_hdrf_partition(self._spark, self._sf_dir)
        from flink_streaming_gnn_spark.graph.ops import graph_partition_assign

        return graph_partition_assign(self._spark, self._sf_dir)

    def embeddings(self) -> DataFrame:
        """Forward pass of the declared layer stack."""
        if self._windowed:
            from flink_streaming_gnn_spark.streaming.gnn import graph_sage_windowed

            return graph_sage_windowed(self._spark, self._sf_dir)
        if self._n_layers == 2:
            from flink_streaming_gnn_spark.graph.sage import graph_sage_2layer

            return graph_sage_2layer(self._spark, self._sf_dir)
        mod = {
            "sage": ("flink_streaming_gnn_spark.graph.sage", "graph_sage_layer"),
            "gcn": ("flink_streaming_gnn_spark.graph.gcn", "graph_gcn_layer"),
            "gin": ("flink_streaming_gnn_spark.graph.gin", "graph_gin_layer"),
            "gat": ("flink_streaming_gnn_spark.graph.attention", "graph_gat_layer"),
        }[self._arch]
        from importlib import import_module

        return getattr(import_module(mod[0]), mod[1])(self._spark, self._sf_dir)

    def scores(self) -> DataFrame:
        """Classification readout over the SAGE embeddings (reference A13)."""
        from flink_streaming_gnn_spark.graph.train import graph_train_readout

        return graph_train_readout(self._spark, self._sf_dir)

    def training_losses(self) -> DataFrame:
        """Per-epoch training losses (reference A10 driver loop)."""
        from flink_streaming_gnn_spark.graph.train import graph_train_epochs

        return graph_train_epochs(self._spark, self._sf_dir)
