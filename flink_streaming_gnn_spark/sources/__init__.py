"""Sources: batch parquet table loader + streaming replay sources.

Analogue of the reference's dataset loaders (SURVEY.md §2A A1 — edge-list /
event sources feeding the Flink dataflow). Here a source is a DataFrame
with pushdown-capable scans, or a Structured Streaming reader.
"""
