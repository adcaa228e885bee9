"""Relational operators of the engine (SURVEY.md §2B).

Each module exposes plain functions ``(spark, sf_dir) -> DataFrame`` plus an
``ORACLE`` dict mapping the same keys to ANSI-SQL twins runnable by DuckDB.
The central registry (``flink_streaming_gnn_spark.registry``) merges them
into the driver contract (``__spark_entry__.py``).

Determinism discipline (SURVEY.md §5.2):
- alias every computed column identically in DataFrame code and oracle SQL;
- round floating-point aggregates in BOTH engines;
- cast integer aggregates to BIGINT in both engines;
- render timestamps as strings (UTC) at the output boundary;
- give every ranking window a total order (explicit tiebreak column).
"""
