"""The local oracle gate: every registered query with an oracle must
match DuckDB exactly (the driver's t2 check, replicated at sf0.001).

Queries without an oracle still must run and return a stable schema.
"""

from __future__ import annotations

import pytest

from cascade_spark.plans.compare import compare
from cascade_spark.plans.registry import load_all

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.builder(spark, sf_dir)
    if q.oracle is None:
        rows = df.limit(5).collect()
        assert df.schema is not None
        assert isinstance(rows, list)
        return
    ok, msg = compare(df, q.oracle, sf_dir)
    assert ok, f"{name}: {msg}"
