"""Scalar/array/map/json function surface + the Python UDF boundary.

Everything here except ``udfs.py`` stays JVM-side (built-in
``pyspark.sql.functions`` inside WholeStageCodegen); ``udfs.py`` is the
engine's one sanctioned Python boundary — Arrow-batched pandas UDFs, the
analogue of the reference's JVM↔ND4J tensor crossing (SURVEY.md §3.2).
"""
