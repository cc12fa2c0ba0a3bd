"""Scalar-function surface (string/date/math/array/json/hash)."""

from cascade_spark.functions import complex, scalars, udfs  # noqa: F401
