"""Blocked fuzzy string matching — the entity-resolution primitive
(SURVEY.md §2B joins family; the edit-distance tier of the dedup ladder in
``llm/dedup.py``, applied to record linkage instead of document text).

``fuzzy_match_levenshtein`` pairs customer names whose Levenshtein edit
distance is within a small threshold, using *sorted-neighborhood blocking*:
candidates come only from the same (nation, custkey÷100) block, so the
per-block pair count is bounded by a constant (~4 customers per block at
every scale factor — block count grows with the data, block SIZE does
not), never the quadratic all-pairs blowup. That is the standard ER
discipline (sorted-neighborhood / windowing, Hernández & Stolfo SIGMOD'95);
at 100 TB the block key would come from an LSH band or a phonetic key, and
``dedup_minhash``'s band join already models that tier — this key models
the bounded-window verify stage with an exact, integer-valued distance.

Plan shape: one self-equi-join on the block key (shuffle both sides on a
well-distributed composite key), the triangular ``id <`` predicate and the
distance filter evaluate JVM-side post-join — no Python, no cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

MAX_DIST = 2
BLOCK_SPAN = 100  # custkey ÷ 100 — bounds block size at every sf


def fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_custkey") / BLOCK_SPAN).cast("long").alias("blk"),
    )
    a = c.select(
        F.col("c_nationkey").alias("nation"),
        "blk",
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
    )
    b = c.select(
        F.col("c_nationkey").alias("nation"),
        "blk",
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
    )
    return (
        a.join(b, ["nation", "blk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= MAX_DIST)
        .select(
            F.col("nation").cast("long").alias("nation"),
            "id_a",
            "id_b",
            "name_a",
            "name_b",
            "dist",
        )
    )


QUERIES = {"fuzzy_match_levenshtein": fuzzy_match_levenshtein}

ORACLE = {
    "fuzzy_match_levenshtein": f"""
        WITH c AS (
            SELECT c_custkey, c_name, c_nationkey,
                   CAST(floor(c_custkey / {BLOCK_SPAN}.0) AS BIGINT) AS blk
            FROM customer
        )
        SELECT CAST(a.c_nationkey AS BIGINT) AS nation,
               a.c_custkey AS id_a, b.c_custkey AS id_b,
               a.c_name AS name_a, b.c_name AS name_b,
               CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        FROM c a JOIN c b
          ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
         AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= {MAX_DIST}
    """,
}
