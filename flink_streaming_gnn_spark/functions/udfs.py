"""Python UDF surface: vectorized scalar / grouped-agg / grouped-map / UDTF
(SURVEY.md §2B UDF rows).

This is the engine's sanctioned Python boundary — every function here moves
data as Arrow record batches (pandas UDFs), the Spark analogue of the
reference's JVM↔ND4J off-heap tensor crossing (/root/reference/README.md:2).
Row-at-a-time Python UDFs are banned from the hot path by design.

IMPORTANT pickling rule: UDF bodies are defined *inside* the query
functions, so cloudpickle serializes them by value. A module-level UDF is
pickled by reference and executors then need this package importable on the
Python-worker path — not true when the engine is driven from a foreign cwd
(e.g. the grading driver).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from flink_streaming_gnn_spark.sources.tables import load_table


def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF: sigmoid over account balances."""
    import numpy as np

    @pandas_udf(DoubleType())
    def sigmoid_scaled(v: pd.Series) -> pd.Series:
        # numpy vectorized over a whole Arrow batch, not per-row
        return 1.0 / (1.0 + np.exp(-v / 10000.0))

    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.round(sigmoid_scaled("c_acctbal"), 6).alias("bal_sigmoid"),
    )


def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF: quantity-weighted mean price per returnflag."""
    import numpy as np

    @pandas_udf(DoubleType())
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        return float(np.sum(v.to_numpy() * w.to_numpy()) / np.sum(w.to_numpy()))

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_mean("l_extendedprice", "l_quantity"), 4).alias("wavg_price")
    )


def apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map (applyInPandas): per-user z-score normalization.

    Scale note: each group becomes one pandas DataFrame in one task —
    fine for per-user/per-key groups with bounded size; a skewed giant key
    would need salting or the window-function form (which is the oracle
    twin here anyway).
    """
    import numpy as np

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        std = v.std(ddof=1)  # sample std == SQL stddev_samp
        pdf = pdf.assign(value_z=np.round((v - v.mean()) / std, 4))
        return pdf[["event_id", "user_id", "value_z"]]

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "user_id", "value").groupBy("user_id").applyInPandas(
        zscore, "event_id long, user_id long, value_z double"
    )


def udtf_explode_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-function surface: posexplode of document tokens (1-based pos)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") < 50)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .select("doc_id", (F.col("pos") + 1).cast("long").alias("pos"), "token")
    )


def udtf_python_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Spark 4 Python UDTF (@udtf + LATERAL): chunk each document
    into 10-token windows, one output row per chunk. This is the
    API-surface twin of udtf_explode_like — for production chunking the
    pure-JVM sequence/explode path (llm/chunking.py) is the hot path; a
    Python UDTF earns its place when the per-row logic genuinely can't be
    expressed in expressions (external tokenizers, stateful parsers).
    Class defined inside the callable (pickle-by-value — survives
    foreign-cwd drivers)."""
    from pyspark.sql.functions import udtf

    chunk_sz = 10

    @udtf(returnType="pos bigint, chunk string, n_toks bigint")
    class DocChunker:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(0, len(toks), chunk_sz):
                part = toks[i : i + chunk_sz]
                yield (i // chunk_sz + 1, " ".join(part), len(part))

    spark.udtf.register("doc_chunker", DocChunker)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("docs_udtf_in")
    return spark.sql(
        """
        SELECT d.doc_id, c.pos, c.chunk, c.n_toks
        FROM docs_udtf_in d, LATERAL doc_chunker(d.text) c
        """
    )


QUERIES = {
    "udf_scalar_pandas": udf_scalar_pandas,
    "udaf_grouped_agg": udaf_grouped_agg,
    "apply_in_pandas": apply_in_pandas,
    "udtf_explode_like": udtf_explode_like,
    "udtf_python_chunks": udtf_python_chunks,
}

ORACLE = {
    "udf_scalar_pandas": """
        SELECT c_custkey,
               round(1.0 / (1.0 + exp(-c_acctbal / 10000.0)), 6) AS bal_sigmoid
        FROM customer
    """,
    "udaf_grouped_agg": """
        SELECT l_returnflag,
               round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "apply_in_pandas": """
        SELECT event_id, user_id,
               round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4) AS value_z
        FROM events
        WINDOW w AS (PARTITION BY user_id)
    """,
    "udtf_explode_like": """
        SELECT doc_id,
               CAST(pos AS BIGINT) AS pos,
               string_split(text, ' ')[pos] AS token
        FROM documents,
             LATERAL (SELECT unnest(generate_series(1, len(string_split(text, ' ')))) AS pos)
        WHERE doc_id < 50
    """,
    "udtf_python_chunks": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w
            FROM documents WHERE doc_id < 50
        ),
        p AS (
            SELECT doc_id, unnest(generate_series(1, (len(w) + 9) // 10)) AS pos, w
            FROM t
        )
        SELECT doc_id,
               CAST(pos AS BIGINT) AS pos,
               array_to_string(w[(pos - 1) * 10 + 1 : least(pos * 10, len(w))], ' ')
                   AS chunk,
               CAST(least(pos * 10, len(w)) - (pos - 1) * 10 AS BIGINT) AS n_toks
        FROM p
    """,
}
