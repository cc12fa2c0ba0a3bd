"""Lakehouse / external connectors — stubs behind import-tries.

Delta Lake, Iceberg, Hudi, Avro, and JDBC all require jars or services
not present in this container (SURVEY.md build notes). The functions
below define the engine's intended surface and fail with a clear
NotImplementedError when the backing package is absent, so a deployment
with the jars on the classpath gets the real path untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta scan — requires delta-spark on the classpath."""
    try:
        import delta  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "delta-spark not installed in this container; "
            "spark.read.format('delta').load(path) once the jar is present"
        ) from exc
    return spark.read.format("delta").load(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg table scan — requires the iceberg-spark runtime jar."""
    if "org.apache.iceberg" not in spark.conf.get("spark.jars.packages", ""):
        raise NotImplementedError(
            "iceberg-spark-runtime not on the classpath; spark.table(table) "
            "against an Iceberg catalog once configured"
        )
    return spark.table(table)


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBC scan — requires a reachable database + driver jar."""
    raise NotImplementedError(
        "no JDBC endpoint in this container; "
        "spark.read.format('jdbc').option('url', url).option('dbtable', table)"
    )
