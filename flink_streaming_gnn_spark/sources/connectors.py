"""Lakehouse / external-system connector surface (SURVEY.md §2A A1; the
"where does a production deployment read from" answer, next to the file
formats in ``formats.py`` and the Kafka builder in ``streaming/sources.py``).

Delta Lake, Apache Iceberg, and JDBC are classpath/infrastructure
dependencies this image does not ship (no lakehouse jars, no database), so
each builder follows the same discipline as the Kafka source: the FULL
production configuration surface is real and importable, availability is
probed honestly at call time, and callers get a precise error — not an
opaque ClassNotFoundException five minutes into a job — when the jar or
endpoint is absent. ``connector_support()`` reports the probe results as a
DataFrame so deployments can assert their classpath in one query.

None of these register as correctness keys: there is nothing to
oracle-check without the backing system, and faking a lakehouse would be
noise. The availability probe and builder contracts are pinned in
tests/test_sources.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# formats probed via the JVM classloader; value = representative class
_FORMAT_CLASSES = {
    "delta": "org.apache.spark.sql.delta.sources.DeltaDataSource",
    "iceberg": "org.apache.iceberg.spark.SparkCatalog",
    "jdbc-postgres": "org.postgresql.Driver",
}


def _jvm_class_available(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # noqa: SLF001
        return True
    except Exception:
        return False


def connector_support(spark: SparkSession) -> DataFrame:
    """(connector, available) — probe the classpath for each optional
    connector so a deployment can assert its setup declaratively."""
    rows = [
        (name, _jvm_class_available(spark, cls))
        for name, cls in sorted(_FORMAT_CLASSES.items())
    ]
    return spark.createDataFrame(rows, "connector string, available boolean")


class ConnectorUnavailable(RuntimeError):
    """Raised when a connector's jar/driver is not on the classpath."""


def read_delta(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Delta table reader incl. time travel (``versionAsOf``). Requires the
    delta-spark jars (`io.delta:delta-spark_2.13`) on the classpath."""
    if not _jvm_class_available(spark, _FORMAT_CLASSES["delta"]):
        raise ConnectorUnavailable(
            "Delta Lake jars not on the classpath — add io.delta:delta-spark "
            "to spark.jars.packages (not shipped in this image)"
        )
    reader = spark.read.format("delta")
    if version is not None:
        reader = reader.option("versionAsOf", version)
    return reader.load(path)


def read_iceberg(spark: SparkSession, table: str, snapshot_id: int | None = None) -> DataFrame:
    """Iceberg catalog-table reader incl. snapshot pinning. Requires the
    iceberg-spark-runtime jar and a configured Spark catalog."""
    if not _jvm_class_available(spark, _FORMAT_CLASSES["iceberg"]):
        raise ConnectorUnavailable(
            "Iceberg runtime not on the classpath — add "
            "org.apache.iceberg:iceberg-spark-runtime and configure "
            "spark.sql.catalog.<name> (not shipped in this image)"
        )
    reader = spark.read.format("iceberg")
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", snapshot_id)
    return reader.load(table)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """Parallel JDBC reader. The partitionColumn/bounds/numPartitions
    quartet is NOT optional at scale — without it Spark reads the whole
    table through one connection; with it, each task reads one bounded
    slice (classic id-range sharding)."""
    if url.startswith("jdbc:postgresql") and not _jvm_class_available(
        spark, _FORMAT_CLASSES["jdbc-postgres"]
    ):
        raise ConnectorUnavailable(
            "PostgreSQL JDBC driver not on the classpath — add "
            "org.postgresql:postgresql to spark.jars.packages"
        )
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions)
        )
    return reader.load()
