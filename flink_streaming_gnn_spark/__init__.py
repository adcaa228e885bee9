"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference streaming-GNN system
(``Rustam-Warwick/flink-streaming-gnn`` — a streaming GNN on Apache Flink +
DL4J, /root/reference/README.md:1-2), re-expressed Spark-first.

Design (SURVEY.md §1.2/§3.2): DataFrame/SQL plans optimized by Catalyst;
columnar parquet at rest; Arrow-batched pandas UDFs only for tensor math;
Structured Streaming for unbounded inputs. The reference's GNN
message-passing core (storage operator + incremental aggregator + embedding
plugin) is exactly ``edges JOIN vertices -> groupBy(dst) -> agg -> vectorized
map`` — a relational plan, not a custom runtime.
"""

from flink_streaming_gnn_spark.session import get_spark
from flink_streaming_gnn_spark.sources.tables import TABLES, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "TABLES"]

__version__ = "0.1.0"
