"""Runtime Bloom-filter join prefilter (SURVEY.md §2B joins family).

``join_bloom_prefilter`` reproduces, as an explicit operator, the runtime
row-level filter big engines inject ahead of a selective join: build a
Bloom filter over the build side's join keys, broadcast its (tiny,
fixed-size) bitset, drop probe-side rows that cannot match *before* the
shuffle, then run the exact join to eliminate the filter's false
positives. The final result is therefore EXACTLY the semi join — the
Bloom stage only changes how many rows reach the exchange — so the key
carries a plain semi-join DuckDB oracle despite the probabilistic
plumbing.

Scale posture (the reason this operator exists):
* the bitset is O(M_BITS) = 8 KiB regardless of build-side cardinality —
  it broadcasts even when the build side's exact key set would not;
* the probe side's membership test is pure JVM expression work
  (xxhash64 → pmod → element_at → bit_get) inside whole-stage codegen —
  no Python, no join, no shuffle — and removes ~(1 − selectivity) of the
  probe rows before the exchange that the exact join needs;
* build-side aggregation packs bits word-wise (groupBy word → bit_or)
  so at most M_BITS/64 = 1024 rows ever reach the driver, bounded by the
  filter geometry, not the data.

Sizing: the filter width ADAPTS to the build side — ~10 bits per
distinct key, rounded up to a power of two, floored at 2^16 and capped
at 2^20 (a 128 KiB bitset; the cap bounds the literal the plan ships —
at 100 TB, a build side too big for the cap would instead broadcast the
bitset as a real broadcast variable, or lean on Spark's own runtime
row-group filters). The sizing read is one O(1) count on the build
side. A fixed 2^16 was measured to SATURATE at the ≈sf1 probe scale
(30k urgent keys × 3 hashes > 65536 bits → every word all-ones; still
correct — the exact join erases everything — but the filter passes 100%
and, subtly, a bitset of all −1 values makes Python's literal inference
type the array int32, which breaks bit_get's [0,64) positions). False
positives only cost wasted shuffle rows — never correctness — because
the exact join runs after the filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.plans.hints import maybe_broadcast
from flink_streaming_gnn_spark.sources.tables import load_table

MIN_BITS = 1 << 16  # filter width floor
MAX_BITS = 1 << 20  # width cap: bounds the literal bitset at 128 KiB
BITS_PER_KEY = 10  # ~1% fp at k=3
K_HASH = 3
PRIORITY = "1-URGENT"  # build-side predicate: urgent orders


def bloom_width(n_keys: int) -> int:
    """Power-of-two filter width for ~BITS_PER_KEY bits/key, clamped."""
    m = MIN_BITS
    while m < min(MAX_BITS, max(MIN_BITS, n_keys * BITS_PER_KEY)):
        m <<= 1
    return m


def _positions(key: Column, m_bits: int) -> list[Column]:
    """K_HASH bit positions for a key — xxhash64 with distinct seeds,
    folded into [0, m_bits). Same family both at build and probe time."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(K_HASH)
    ]


def build_bloom_bitset(keys: DataFrame, key_col: str, m_bits: int) -> list[int]:
    """Aggregate a key frame into a packed bitset (list of m_bits/64
    longs). One explode (K_HASH rows per key) + one word-keyed bit_or
    aggregate; the driver reads at most m_bits/64 rows — bounded by
    filter geometry, not data."""
    words = (
        keys.select(
            F.explode(F.array(*_positions(F.col(key_col), m_bits))).alias("pos")
        )
        .select(
            F.shiftright("pos", 6).alias("w"),
            F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
        .collect()
    )
    bitset = [0] * (m_bits // 64)
    for r in words:
        bitset[r["w"]] = r["mask"]
    return bitset


def bloom_might_contain(bitset: list[int], key: Column) -> Column:
    """Membership predicate against a literal bitset — all K_HASH bits
    set. Pure JVM expressions; compiles into whole-stage codegen. The
    explicit array<bigint> cast pins the literal's type: a saturated
    bitset (every word −1) would otherwise be inferred int32 and break
    bit_get's [0, 64) position range."""
    m_bits = len(bitset) * 64
    bits_lit = F.lit(bitset).cast("array<bigint>")
    checks = []
    for pos in _positions(key, m_bits):
        word = F.element_at(bits_lit, (F.shiftright(pos, 6) + 1).cast("int"))
        checks.append(F.bit_get(word, F.pmod(pos, F.lit(64)).cast("int")) == 1)
    pred = checks[0]
    for c in checks[1:]:
        pred = pred & c
    return pred


def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry key: revenue of lineitems belonging to urgent-priority
    orders, computed as bloom-prefilter → exact semi join → aggregate.
    Exact oracle (the Bloom stage is correctness-neutral)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    urgent = orders.filter(F.col("o_orderpriority") == PRIORITY).select("o_orderkey")
    m_bits = bloom_width(urgent.count())  # O(1) sizing read
    bitset = build_bloom_bitset(urgent, "o_orderkey", m_bits)
    prefiltered = lineitem.filter(bloom_might_contain(bitset, F.col("l_orderkey")))
    exact = prefiltered.join(
        maybe_broadcast(urgent),
        prefiltered.l_orderkey == urgent.o_orderkey,
        "left_semi",
    )
    return (
        exact.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


QUERIES = {"join_bloom_prefilter": join_bloom_prefilter}

ORACLE = {
    "join_bloom_prefilter": f"""
        SELECT l_returnflag,
               count(*) AS n_items,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_orderpriority = '{PRIORITY}'
        )
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
}
