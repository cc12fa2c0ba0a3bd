"""Shared helpers for declared-query builders.

Determinism helpers: floating aggregates accumulate in DECIMAL (exact,
order-independent) and only the *final* projection rounds and casts to
DOUBLE — so Spark and the DuckDB oracle produce bit-identical float64
values regardless of parallel summation order (SURVEY.md §2B rules).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cascade_spark.tables import load

# Raw fixture money/quantity columns captured as exact decimals.
# decimal(12,4): 8 integer digits, 4 fractional — fits every fixture
# measure; products of two stay within both engines' 38-digit cap.
DEC = "decimal(12,4)"


def dec(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def d2(c: Column) -> Column:
    """Final projection of a decimal aggregate: round to 2, cast double."""
    return F.round(c, 2).cast("double")


def bigint(c: Column) -> Column:
    return c.cast("long")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load(spark, sf_dir, name)
