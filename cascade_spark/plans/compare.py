"""Local replica of the driver's DuckDB-oracle comparison.

Runs a declared query through Spark and its oracle SQL through DuckDB on
the same parquet directory, canonicalizes both results (sort columns by
name, sort rows), and diffs them exactly. Used by tests/ to catch
hash-mismatches before the driver does.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from cascade_spark.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and represent exactly
        return repr(v + 0.0)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.floating):
            return _canon_cell(float(v))
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.ndarray):
            return tuple(_canon_cell(x) for x in v.tolist())
    except ImportError:  # pragma: no cover
        pass
    return v


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    """Return (match, message)."""
    spark_pd = spark_df.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        duck_pd = con.sql(oracle_sql).df()
    finally:
        con.close()

    s_cols, d_cols = sorted(spark_pd.columns), sorted(duck_pd.columns)
    if s_cols != d_cols:
        return False, f"column mismatch: spark={s_cols} duckdb={d_cols}"
    if len(spark_pd) != len(duck_pd):
        return False, f"row count mismatch: spark={len(spark_pd)} duckdb={len(duck_pd)}"
    s_rows, d_rows = canonicalize(spark_pd), canonicalize(duck_pd)
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            return False, f"first differing row {i}: spark={a!r} duckdb={b!r}"
    return True, f"ok ({len(s_rows)} rows)"
