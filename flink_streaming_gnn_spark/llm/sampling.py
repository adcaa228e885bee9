"""Deterministic corpus sampling and winnowing fingerprints (the
training-data-pipeline tier next to ``llm/pipeline.py``'s gates).

``sample_priority_hash``: priority sampling — the distributed,
reproducible replacement for reservoir sampling. Each doc gets a
priority from a Knuth multiplicative hash of its id; the sample is the
k smallest priorities per stratum (one row_number window per source).
Unlike ``rand()``-based sampling this is (a) deterministic across
engines, retries, AND cluster sizes (the priority is a pure function of
the row), (b) mergeable — the union of per-partition top-k pools
contains the global top-k, so at 100 TB it's a partial top-k per task +
one tiny merge, never a global sort; and (c) consistent under corpus
growth (a doc's priority never changes, so samples are stable across
snapshots — the property dataset versioning needs).

``text_winnowing_fingerprint``: the full MOSS winnowing scheme
(Schleimer/Wilkerson/Aiken, SIGMOD 2003) — k-gram hashes, minimum per
sliding window of w consecutive hashes, distinct selected fingerprints
per doc. Guarantees every match of length ≥ w+k−1 between two docs
shares a fingerprint, with ~2/(w+1) selection density — the
fingerprint-index input for plagiarism/near-dup mining that the
simpler min-shingle in ``llm/textstats.py:text_fingerprint`` only
approximates. Hashes are md5 hex strings (lexicographic min — identical
in any engine); the whole plan is explode + one bounded window + one
distinct, all JVM-side, shuffling on doc_id only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

KNUTH = 2654435761  # multiplicative hash constant (Knuth §6.4)
HASH_MOD = 1 << 32
SAMPLE_K = 5  # docs kept per source stratum
WIN_K = 8  # winnowing k-gram length (chars)
WIN_W = 8  # winnowing window (consecutive k-gram hashes)


def sample_priority_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-SAMPLE_K docs per source by multiplicative-hash priority —
    a deterministic, engine-portable stratified sample."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        ((F.col("doc_id") * KNUTH) % HASH_MOD).cast("long").alias("priority"),
    )
    w = Window.partitionBy("source").orderBy("priority", "doc_id")
    return (
        d.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= SAMPLE_K)
        .orderBy("source", "rk")
    )


def text_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct winnowing fingerprints per doc: md5 of char k-grams,
    window-min over WIN_W consecutive positions (full windows only),
    deduplicated.

    A document's winnowing is a pure per-row function, so the whole
    scheme runs INSIDE array higher-order functions — k-gram hashes via
    ``transform``, window minima via ``transform(sequence, i ->
    array_min(slice(hs, i, W)))``, per-doc dedup via ``array_distinct``
    — and the plan is ONE map-only scan + explode of the selected
    fingerprints. The earlier shape (explode every char position, then a
    doc-partitioned sliding-min window) shuffled AND sorted |corpus
    chars| rows of 32-char hashes; measured at the ×10 probe (500k docs,
    ~75M k-grams): 306 s → map-only rewrite 76 s (now md5-throughput
    bound with zero exchanges — embarrassingly parallel). Same result
    set, same
    oracle (the DuckDB twin keeps the unnest+window formulation, making
    the hash check a cross-formulation proof)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.length("text").alias("len")
    )
    # sequence(1, n) with n < 1 would generate a DESCENDING sequence in
    # Spark — gate to an empty array so short docs drop out, matching
    # DuckDB's empty range()
    hashes = F.expr(
        f"transform(CASE WHEN len >= {WIN_K} THEN sequence(1, len - {WIN_K - 1}) "
        f"ELSE array() END, p -> md5(substring(text, p, {WIN_K})))"
    )
    # full windows only: starts 1 .. n_grams − (WIN_W − 1)
    fps = F.expr(
        f"array_distinct(transform("
        f"CASE WHEN size(hs) >= {WIN_W} THEN sequence(1, size(hs) - {WIN_W - 1}) "
        f"ELSE array() END, i -> array_min(slice(hs, i, {WIN_W}))))"
    )
    return (
        d.select("doc_id", hashes.alias("hs"))
        .select("doc_id", F.explode(fps).alias("fp"))
        # no orderBy: keeps the plan exchange-free (map-only); the driver
        # compare is order-insensitive
    )


QUERIES = {
    "sample_priority_hash": sample_priority_hash,
    "text_winnowing_fingerprint": text_winnowing_fingerprint,
}

ORACLE = {
    "sample_priority_hash": f"""
        WITH d AS (
            SELECT doc_id, source,
                   CAST((doc_id * {KNUTH}) % {HASH_MOD} AS BIGINT) AS priority
            FROM documents
        )
        SELECT doc_id, source, priority,
               CAST(row_number() OVER (
                   PARTITION BY source ORDER BY priority, doc_id
               ) AS BIGINT) AS rk
        FROM d
        QUALIFY rk <= {SAMPLE_K}
        ORDER BY source, rk
    """,
    "text_winnowing_fingerprint": f"""
        WITH pos AS (
            SELECT doc_id, length(text) AS len, text,
                   unnest(range(1, greatest(length(text) - {WIN_K - 1}, 0) + 1))
                       AS p
            FROM documents
        ),
        h AS (
            SELECT doc_id, len, p,
                   md5(substr(text, CAST(p AS INTEGER), {WIN_K})) AS hh
            FROM pos
        ),
        sel AS (
            SELECT doc_id, p, len,
                   min(hh) OVER (
                       PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW AND {WIN_W - 1} FOLLOWING
                   ) AS fp
            FROM h
        )
        SELECT DISTINCT doc_id, fp
        FROM sel
        WHERE p <= len - {WIN_K - 1} - {WIN_W - 1}
        ORDER BY doc_id, fp
    """,
}


ARES_K = 25  # global sample size


def sample_weighted_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis–Spirakis A-ES
    (Inf. Proc. Letters 2006): each item draws u ~ U(0,1) and keeps key
    ln(u)/w; the top-K keys are a weighted random sample where inclusion
    probability tracks the weight — here weight = n_chars, the "sample
    long documents proportionally more" curation knob next to the
    unweighted ``sample_priority_hash``.

    Deterministic, engine-portable randomness: u derives from md5 nibbles
    (the repo-wide hash discipline), so both engines draw the same u.
    Keys are maximized as ln(u)/w (monotone in u^(1/w); u < 1 makes the
    key negative and larger-w keys closer to 0). The key is ROUNDED to
    12 dp before ranking: ln() is not bit-specified across libms, so the
    rounding collapses last-ulp divergence; genuinely tied keys break on
    doc_id. One map pass + one GLOBAL top-K via orderBy().limit() —
    Spark plans that as TakeOrderedAndProject (each task keeps its own
    K, one K-row merge at the driver; WindowGroupLimit only fires on
    PARTITIONED windows, so the rank-filter shape of
    ``sample_priority_hash`` would single-reduce a global sample —
    measured 46.9 s vs 1.5 s at the ×10 probe). The rank column is
    derived AFTER the limit, a window over K rows.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        # u in (0,1]: 8 md5 nibbles → (v+1) / 2^32
        (
            (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
             .cast("double") + 1.0)
            / F.lit(float(2**32))
        ).alias("u"),
    )
    keyed = d.select(
        "doc_id",
        "n_chars",
        F.round(F.log("u") / F.col("n_chars"), 12).alias("ares_key"),
    )
    top = keyed.orderBy(F.col("ares_key").desc(), "doc_id").limit(ARES_K)
    w = Window.orderBy(F.col("ares_key").desc(), "doc_id")  # K rows only
    return top.withColumn("rk", F.row_number().over(w).cast("long")).orderBy("rk")


QUERIES["sample_weighted_ares"] = sample_weighted_ares
ORACLE["sample_weighted_ares"] = f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               round(
                   ln(((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 268435456.0
                     + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 16777216.0
                     + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 1048576.0
                     + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) * 65536.0
                     + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 5, 1)) - 1) * 4096.0
                     + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 6, 1)) - 1) * 256.0
                     + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 7, 1)) - 1) * 16.0
                     + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 8, 1)) - 1)
                     + 1.0) / 4294967296.0)
                   / n_chars, 12) AS ares_key
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, n_chars, ares_key,
               CAST(row_number() OVER (ORDER BY ares_key DESC, doc_id)
                    AS BIGINT) AS rk
        FROM keyed
    )
    SELECT doc_id, n_chars, ares_key, rk
    FROM ranked WHERE rk <= {ARES_K}
    ORDER BY rk
"""
