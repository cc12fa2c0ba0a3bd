"""Batch sources & sinks (parquet/csv/json scans, partitioned writes)."""

from cascade_spark.sources import scans  # noqa: F401
from cascade_spark.sources import cascade_bus  # noqa: F401
from cascade_spark.sources import topics  # noqa: F401
from cascade_spark.sources import lakehouse  # noqa: F401
