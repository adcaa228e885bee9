"""Per-key periodogram — discrete Fourier power at fixed seasonal
frequencies (SURVEY.md §2B timeseries family; the spectral companion of
``operators/seasonal.py``'s time-domain profile).

For each user and each daily harmonic k = 1..N_HARMONICS the classic
Schuster periodogram terms:

    C_k = Σ x·cos(2π·k·t/P),  S_k = Σ x·sin(2π·k·t/P),
    power_k = (C_k² + S_k²) / n²

computed as plain JVM expressions + ONE hash aggregate keyed on user_id
(the harmonics unroll into 2·N_HARMONICS sum columns inside the same
agg — no extra shuffle per frequency, and partial aggregation combines
map-side). At 100 TB this is a single exchange of |users| × (2k+1)
doubles.

Cross-engine float discipline: the phase argument is built from an exact
integer microsecond offset from a fixed epoch (both engines compute
``2π·k·(t_us − BASE_US) / (P·10⁶)`` from the same exact integer), so
cos/sin see bit-identical arguments and differ only in libm's last ulp;
the power is rounded to 4 dp at O(1..10³) magnitudes, far above the
accumulated ulp noise.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

PERIOD_S = 86_400  # fundamental period: one day
N_HARMONICS = 4
BASE_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in µs (fixture epoch)


def ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    # ts scans as TIMESTAMP_NTZ; the cast to (UTC-session) timestamp is an
    # identity re-tag that lets unix_micros read the exact integer µs
    t_us = (F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(BASE_US)).cast(
        "double"
    )
    aggs = [F.count("*").alias("n")]
    for k in range(1, N_HARMONICS + 1):
        arg = t_us * F.lit(2.0 * math.pi * k / (PERIOD_S * 1e6))
        aggs.append(F.sum(F.col("value") * F.cos(arg)).alias(f"c{k}"))
        aggs.append(F.sum(F.col("value") * F.sin(arg)).alias(f"s{k}"))
    wide = ev.groupBy("user_id").agg(*aggs)
    powers = [
        # c*c (not pow(c, 2)): multiplication is IEEE-exact-rounded in both
        # engines, pow's 2-exponent path need not be bit-identical
        F.round(
            (F.col(f"c{k}") * F.col(f"c{k}") + F.col(f"s{k}") * F.col(f"s{k}"))
            / (F.col("n") * F.col("n")),
            4,
        ).alias(f"power_k{k}")
        for k in range(1, N_HARMONICS + 1)
    ]
    return wide.select(
        "user_id", F.col("n").cast("long").alias("n"), *powers
    ).orderBy("user_id")


def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral entropy per user — Shannon entropy of the normalized
    periodogram power distribution over the N_HARMONICS daily harmonics
    (plus the dominant harmonic): LOW entropy = one periodicity dominates
    (a strongly rhythmic user), HIGH = spectrally flat. The standard
    signal-regularity feature next to the raw periodogram.

    Determinism: entropies are computed from the 4-dp ROUNDED powers
    (identical doubles in both engines by the periodogram's argument
    discipline), so ln() sees bit-identical inputs; the dominant-harmonic
    argmax uses ≥ comparisons on those rounded values with
    smallest-k-wins ties. Same single-exchange plan as ts_periodogram —
    the entropy is a per-row expression on the |users|-sized aggregate."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    t_us = (F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(BASE_US)).cast(
        "double"
    )
    aggs = [F.count("*").alias("n")]
    for k in range(1, N_HARMONICS + 1):
        arg = t_us * F.lit(2.0 * math.pi * k / (PERIOD_S * 1e6))
        aggs.append(F.sum(F.col("value") * F.cos(arg)).alias(f"c{k}"))
        aggs.append(F.sum(F.col("value") * F.sin(arg)).alias(f"s{k}"))
    wide = ev.groupBy("user_id").agg(*aggs)
    pw = [
        F.round(
            (F.col(f"c{k}") * F.col(f"c{k}") + F.col(f"s{k}") * F.col(f"s{k}"))
            / (F.col("n") * F.col("n")),
            4,
        )
        for k in range(1, N_HARMONICS + 1)
    ]
    total = sum(pw[1:], pw[0])
    terms = []
    for k in range(N_HARMONICS):
        p = pw[k] / total
        terms.append(F.when(pw[k] > 0, -p * F.log(p)).otherwise(F.lit(0.0)))
    h = sum(terms[1:], terms[0])
    dom = F.lit(N_HARMONICS)
    for k in range(N_HARMONICS - 1, 0, -1):  # smallest k wins ties
        rest = pw[k:]
        dom = F.when(pw[k - 1] >= F.greatest(*rest) if len(rest) > 1 else pw[k - 1] >= rest[0], F.lit(k)).otherwise(dom)
    return (
        wide.select(
            "user_id",
            F.when(total > 0, F.round(h, 6)).alias("spec_entropy"),
            F.when(total > 0, F.round(h / F.lit(math.log(N_HARMONICS)), 6)).alias(
                "spec_entropy_norm"
            ),
            F.when(total > 0, dom).otherwise(F.lit(None)).cast("long").alias("dominant_k"),
        )
        .orderBy("user_id")
    )


def _spectral_entropy_oracle_sql() -> str:
    cols = []
    for k in range(1, N_HARMONICS + 1):
        arg = f"(epoch_us(ts) - {BASE_US}) * {2.0 * math.pi * k / (PERIOD_S * 1e6)!r}"
        cols.append(f"sum(value * cos({arg})) AS c{k}")
        cols.append(f"sum(value * sin({arg})) AS s{k}")
    inner = ",\n               ".join(cols)
    pcols = ",\n               ".join(
        f"round((c{k} * c{k} + s{k} * s{k}) / (n * n), 4) AS p{k}"
        for k in range(1, N_HARMONICS + 1)
    )
    tot = " + ".join(f"p{k}" for k in range(1, N_HARMONICS + 1))
    hterms = " + ".join(
        f"CASE WHEN p{k} > 0 THEN -(p{k} / tot) * ln(p{k} / tot) ELSE 0.0 END"
        for k in range(1, N_HARMONICS + 1)
    )
    dom = f"{N_HARMONICS}"
    for k in range(N_HARMONICS - 1, 0, -1):
        rest = ", ".join(f"p{j}" for j in range(k + 1, N_HARMONICS + 1))
        cmp_ = f"greatest({rest})" if "," in rest else rest
        dom = f"CASE WHEN p{k} >= {cmp_} THEN {k} ELSE {dom} END"
    return f"""
        WITH wide AS (
            SELECT user_id, count(*) AS n,
               {inner}
            FROM events GROUP BY user_id
        ),
        pw AS (
            SELECT user_id,
               {pcols}
            FROM wide
        ),
        t AS (SELECT *, {tot} AS tot FROM pw)
        SELECT user_id,
               CASE WHEN tot > 0 THEN round({hterms}, 6) END AS spec_entropy,
               CASE WHEN tot > 0 THEN round(({hterms}) / {math.log(N_HARMONICS)!r}, 6) END
                   AS spec_entropy_norm,
               CAST(CASE WHEN tot > 0 THEN {dom} END AS BIGINT) AS dominant_k
        FROM t ORDER BY user_id
    """


def _periodogram_oracle_sql() -> str:
    cols = []
    for k in range(1, N_HARMONICS + 1):
        arg = f"(epoch_us(ts) - {BASE_US}) * {2.0 * math.pi * k / (PERIOD_S * 1e6)!r}"
        cols.append(f"sum(value * cos({arg})) AS c{k}")
        cols.append(f"sum(value * sin({arg})) AS s{k}")
    inner = ",\n               ".join(cols)
    outer = ",\n               ".join(
        f"round((c{k} * c{k} + s{k} * s{k}) / (n * n), 4) AS power_k{k}"
        for k in range(1, N_HARMONICS + 1)
    )
    return f"""
        WITH wide AS (
            SELECT user_id, count(*) AS n,
               {inner}
            FROM events GROUP BY user_id
        )
        SELECT user_id, CAST(n AS BIGINT) AS n,
               {outer}
        FROM wide ORDER BY user_id
    """


QUERIES = {
    "ts_periodogram": ts_periodogram,
    "ts_spectral_entropy": ts_spectral_entropy,
}
ORACLE = {
    "ts_periodogram": _periodogram_oracle_sql(),
    "ts_spectral_entropy": _spectral_entropy_oracle_sql(),
}
