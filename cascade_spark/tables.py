"""Fixture table loading.

The driver testdata (TESTDATA.md / FIXTURES.md) is one parquet file per
table per scale-factor directory. At 100 TB each "table" would be a
partitioned parquet/iceberg dataset; ``load`` stays a plain
``spark.read.parquet`` either way — Catalyst handles partition pruning,
predicate pushdown, and column pruning from the declarative plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that should always be broadcast in joins at any
# scale (region: 5 rows, nation: 25 — fixed-size catalogs even at 100 TB).
BROADCASTABLE = {"region", "nation", "supplier", "part", "customer"}


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs this engine depends on, set defensively so queries
    behave identically on an externally-created SparkSession (e.g. the
    driver harness's): UTC timestamps (oracle parity) and nanos-as-long
    parquet reads (events.ts is TIMESTAMP(NANOS), which vanilla Spark
    refuses). Both are runtime-settable SQL confs."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # cascade_bus implements pushFilters; Spark raises (not ignores) on a
    # pushdown-capable python source when this is off
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table.

    ``events.ts`` is TIMESTAMP(NANOS) in parquet; with
    ``spark.sql.legacy.parquet.nanosAsLong`` it surfaces as a long that we
    floor-divide to microseconds — the same truncation DuckDB applies when
    it reads nanos into its µs TIMESTAMP, so oracle comparisons agree.
    """
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql use)."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
