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


# --- deterministic rounded averages -----------------------------------------
# ROUND(sum/count, k) on DOUBLE diverges between engines when the exact
# quotient lands on a .xx5 boundary (Spark rounds the decimal expansion
# half-up; DuckDB's float path can go either way). With a scale-4 decimal
# sum the quotient is rational with small denominator, so boundaries are
# common. Instead compute round_half_up((S/10^4/count)*10^k) via exact
# integer arithmetic: n = (2*S*10^k + 10^4*count) intdiv (2*10^4*count),
# result n/10^k. All intermediates < 2^53 for fixture magnitudes.


def _intdiv(a: Column, b: Column) -> Column:
    # (a - a%b)/b: numerator is an exact multiple of b and both fit in
    # double's 53-bit integer range, so the FP division is exact.
    return ((a - F.pmod(a, b)) / b).cast("long")


def avg_round(sum_dec: Column, count: Column, k: int = 2) -> Column:
    """Half-up rounded average (to k decimals) of a scale-4 decimal sum —
    bit-identical to sql_avg_round on the DuckDB side."""
    s = (sum_dec * 10000).cast("long")
    c = count.cast("long") * 10000
    n = _intdiv(F.lit(2) * s * (10**k) + c, F.lit(2) * c)
    return (n.cast("double") / F.lit(float(10**k))).alias("avg")


def sql_avg_round(sum_expr: str, k: int = 2, count_expr: str = "COUNT(*)") -> str:
    """DuckDB SQL for avg_round. ``sum_expr`` must be a scale-4 DECIMAL
    sum, e.g. ``SUM(CAST(x AS DECIMAL(12,4)))``."""
    s = f"CAST({sum_expr} * 10000 AS BIGINT)"
    c = f"(10000 * CAST({count_expr} AS BIGINT))"
    return f"(CAST((2 * {s} * {10**k} + {c}) // (2 * {c}) AS DOUBLE) / {10**k})"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load(spark, sf_dir, name)


def widen(df: DataFrame) -> DataFrame:
    """Spread a small-file scan across all cores before CPU-heavy per-row
    work (hashing, shingling, HOF evaluation, Python UDFs). The fixtures
    are single parquet files → 1-3 input partitions → near-single-task
    execution otherwise. Scale-adaptive since round 12: when the planned
    scan parallelism already reaches the session's core count (the 100 TB
    case — real tables plan thousands of splits), the repartition is
    SKIPPED entirely instead of injecting a round-robin shuffle of the
    whole input (guide §2.5 input-skew remedy, applied only when the
    input is actually under-parallel)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
