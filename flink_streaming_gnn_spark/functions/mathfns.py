"""Math function family (SURVEY.md §2B fn_math).

Transcendentals (ln/exp/sqrt/pow) are rounded to 6 decimals in both engines
to absorb any libm last-bit differences; pure arithmetic stays raw (IEEE
identical). ceil/floor cast to DOUBLE on both sides (Spark yields LONG,
DuckDB DOUBLE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table


def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 0).alias("price_round0"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.pow("l_quantity", 2), 6).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.ceil("l_quantity").cast("double").alias("qty_ceil"),
        F.floor("l_tax" ).cast("double").alias("tax_floor"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("key_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_discount") - F.col("l_tax")).alias("rate_sign"),
    )


def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family over event ids: and/or/xor, shifts, bit
    extraction and popcount — the primitives under hash partitioners,
    bloom filters and bitmap indexes, all JVM expressions."""
    ev = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    uid = F.col("user_id")
    return ev.select(
        "event_id",
        eid.bitwiseAND(uid).cast("long").alias("band"),
        eid.bitwiseOR(uid).cast("long").alias("bor"),
        eid.bitwiseXOR(uid).cast("long").alias("bxor"),
        F.shiftleft(eid, 3).cast("long").alias("shl3"),
        F.shiftright(eid, 2).cast("long").alias("shr2"),
        F.expr("bit_count(event_id)").cast("long").alias("popcount"),
        F.expr("getbit(event_id, 0)").cast("long").alias("bit0"),
        F.expr("~event_id").cast("long").alias("bnot"),
    )


def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic surface: try_divide / try_cast /
    try_element_at return NULL instead of raising — the error-tolerant
    path a pipeline uses where a single bad row must not fail a 100 TB
    job. Division by an engineered zero, a cast of free text to int, and
    an out-of-range array index each produce NULL in both engines
    (DuckDB: TRY_CAST + NULLIF-guarded division + safe list indexing)."""
    ev = load_table(spark, sf_dir, "events")
    zero_when_even = F.col("event_id") % 2  # 0 for even ids
    return ev.select(
        "event_id",
        F.try_divide(F.col("value"), zero_when_even).alias("div_or_null"),
        # try_cast on BOTH sides (oracle uses TRY_CAST) so the semantics
        # are equivalent for every input, not just the fixture's
        # non-numeric event types — try_to_number('999') would reject
        # 4+-digit / decimal / signed strings that TRY_CAST accepts
        F.expr("try_cast(event_type AS double)").alias("cast_or_null"),
        F.try_element_at(
            F.split("event_type", ""), (F.col("event_id") % 20 + 1).cast("int")
        ).alias("char_or_null"),
    ).orderBy("event_id")


QUERIES = {
    "fn_math": fn_math,
    "fn_bitwise": fn_bitwise,
    "fn_try_arithmetic": fn_try_arithmetic,
}

ORACLE = {
    "fn_try_arithmetic": """
        SELECT event_id,
               value / nullif(event_id % 2, 0) AS div_or_null,
               TRY_CAST(event_type AS DOUBLE) AS cast_or_null,
               string_split(event_type, '')[CAST(event_id % 20 + 1 AS INTEGER)]
                   AS char_or_null
        FROM events
        ORDER BY event_id
    """,
    "fn_math": """
        SELECT l_orderkey,
               l_linenumber,
               round(l_extendedprice, 0) AS price_round0,
               abs(l_discount - 0.05) AS disc_dev,
               round(ln(l_extendedprice), 6) AS ln_price,
               round(exp(l_discount), 6) AS exp_disc,
               round(pow(l_quantity, 2), 6) AS qty_sq,
               round(sqrt(l_extendedprice), 6) AS sqrt_price,
               CAST(ceil(l_quantity) AS DOUBLE) AS qty_ceil,
               CAST(floor(l_tax) AS DOUBLE) AS tax_floor,
               CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
               greatest(l_discount, l_tax) AS max_rate,
               least(l_discount, l_tax) AS min_rate,
               CAST(sign(l_discount - l_tax) AS DOUBLE) AS rate_sign
        FROM lineitem
    """,
    "fn_bitwise": """
        SELECT event_id,
               CAST(event_id & user_id AS BIGINT) AS band,
               CAST(event_id | user_id AS BIGINT) AS bor,
               CAST(xor(event_id, user_id) AS BIGINT) AS bxor,
               CAST(event_id << 3 AS BIGINT) AS shl3,
               CAST(event_id >> 2 AS BIGINT) AS shr2,
               CAST(bit_count(event_id) AS BIGINT) AS popcount,
               CAST(event_id & 1 AS BIGINT) AS bit0,
               CAST(~event_id AS BIGINT) AS bnot
        FROM events
    """,
}
