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


def lakehouse_probe() -> dict[str, bool]:
    """Availability probe, run at import: which lakehouse paths can this
    environment actually serve? (python package AND datasource jar)."""
    import importlib.util

    out = {
        "delta": importlib.util.find_spec("delta") is not None,
        "iceberg": False,  # needs iceberg-spark-runtime jar + catalog conf
        "hudi": False,
        "avro": False,  # core avro jars ship with Spark, but the
        # spark-avro DATASOURCE jar is a separate artifact absent here
        # (probe: spark.read.format('avro') -> "Failed to find data source")
    }
    try:
        import pyspark, os, glob

        jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        out["avro"] = bool(glob.glob(os.path.join(jars, "spark-avro*.jar")))
        out["iceberg"] = bool(glob.glob(os.path.join(jars, "iceberg-spark-runtime*.jar")))
        out["hudi"] = bool(glob.glob(os.path.join(jars, "hudi-spark*.jar")))
    except Exception:
        pass
    return out


if lakehouse_probe()["delta"]:
    from pyspark.sql import functions as F

    from cascade_spark.plans.registry import register
    from cascade_spark.tables import load as _load

    @register(
        "scan_delta_roundtrip",
        "sources",
        doc="Delta Lake write+read roundtrip over the region table — "
        "registered only where delta-spark is importable (probe-gated "
        "like stream_tws_counter). Oracle = the parquet source itself.",
        oracle="SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    )
    def scan_delta_roundtrip(spark, sf_dir):
        import tempfile

        out = tempfile.mkdtemp(prefix="delta_rt_")
        src = _load(spark, sf_dir, "region").select("r_regionkey", "r_name")
        src.write.format("delta").mode("overwrite").save(out)
        return spark.read.format("delta").load(out).orderBy("r_regionkey")
