"""Round-9 operator properties.

Pins the semantics-hardening fixes from the round-8 ADVICE sweep:
- the sign-test binomial tail is DECIMAL(38,0)-exact far past the old
  int64 wrap point (n ~ 49) and RAISES past the decimal-exact cap;
- the PMI lift ranking is the same exact integer on both engines.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _tail_row(spark, n: int, m: int):
    from cascade_spark.operators.inference_extra import _binom_tail_expr

    df = spark.range(1).select(
        F.lit(n).cast("long").alias("n"), F.lit(m).cast("long").alias("m")
    )
    return df.select(F.expr(_binom_tail_expr()).alias("b")).first()["b"]


@pytest.mark.parametrize(
    "n,m",
    [(0, 0), (1, 0), (30, 15), (49, 20), (60, 30), (90, 45), (100, 50)],
)
def test_binom_tail_decimal_exact(spark, n, m):
    """Exact vs Python bigint math, including past the old int64 wrap."""
    b = _tail_row(spark, n, m)
    want_s = sum(math.comb(n, i) for i in range(m + 1)) if n else 1
    assert int(b["s"]) == want_s
    assert int(b["p"]) == 2**n


def test_binom_tail_raises_past_cap(spark):
    from cascade_spark.operators.inference_extra import _BINOM_N_CAP

    with pytest.raises(Exception, match="decimal"):
        _tail_row(spark, _BINOM_N_CAP + 1, 10)


def test_pmi_lift_is_engine_identical_integer(spark, sf_dir):
    """The Spark decimal DIV lift equals DuckDB's HUGEINT // lift for
    every surviving pair — top-K membership can't drift on rounding."""
    import duckdb

    n = 7  # arbitrary corpus size for the lift formula
    df = spark.createDataFrame(
        [(3, 4, 5), (1, 2, 3), (2, 9, 9), (5, 5, 7)], "c_xy long, c_x long, c_y long"
    )
    got = {
        (r["c_xy"], r["c_x"], r["c_y"]): r["lift"]
        for r in df.select(
            "c_xy",
            "c_x",
            "c_y",
            F.expr(
                f"(CAST(c_xy AS DECIMAL(38,0)) * {n} * 1000000000000)"
                " DIV (CAST(c_x AS DECIMAL(38,0)) * c_y)"
            ).alias("lift"),
        ).collect()
    }
    con = duckdb.connect()
    for (c_xy, c_x, c_y), lift in got.items():
        want = con.sql(
            f"SELECT (CAST({c_xy} AS HUGEINT) * {n} * 1000000000000)"
            f" // (CAST({c_x} AS HUGEINT) * {c_y})"
        ).fetchone()[0]
        assert int(lift) == int(want)
    con.close()


def test_iceberg_hudi_registration_follows_probe(spark):
    """scan_iceberg_roundtrip / scan_hudi_roundtrip register exactly
    where their runtime jars exist (the scan_delta_roundtrip /
    scan_avro_roundtrip probe discipline — round-8 verdict item #7:
    users landing on those table formats see a declared probe-gated
    surface, not an undeclared wall). Where present, each must be green
    end-to-end."""
    from cascade_spark.plans.registry import load_all
    from cascade_spark.sources.lakehouse import lakehouse_probe

    probe = lakehouse_probe()
    missing = []
    for fmt, qname in [
        ("iceberg", "scan_iceberg_roundtrip"),
        ("hudi", "scan_hudi_roundtrip"),
    ]:
        if not probe[fmt]:
            assert qname not in load_all()
            missing.append(fmt)
            continue
        rows = load_all()[qname].builder(spark, "/root/testdata/sf0.001").collect()
        assert rows and rows[0]["r_regionkey"] == 0
    if missing:
        pytest.skip(f"runtime jars absent in this container: {missing}")


@pytest.mark.parametrize(
    "a,b,c,d",
    [(3, 7, 5, 2), (0, 10, 0, 5), (1, 0, 0, 1), (8, 2, 2, 8),
     (0, 0, 0, 0), (5, 5, 5, 5), (12, 1, 3, 14), (2, 0, 9, 0)],
)
def test_fisher_exact_matches_bigint_math(spark, a, b, c, d):
    """The hypergeometric fold equals exact Python big-integer Fisher on
    arbitrary 2x2 tables, including degenerate margins."""
    from cascade_spark.operators.assoc_stats import _fisher_from_cells

    cells = spark.createDataFrame([(a, b, c, d)], "a long, b long, c long, d long")
    got = _fisher_from_cells(cells).first()["p2_bp"]

    r1, r2, c1 = a + b, c + d, a + c
    lo, hi = max(0, c1 - r2), min(r1, c1)
    ws = {k: math.comb(r1, k) * math.comb(r2, c1 - k) for k in range(lo, hi + 1)}
    w_obs = ws[a]
    pnum = sum(w for w in ws.values() if w <= w_obs)
    total = sum(ws.values())
    want = min(10000, (pnum * 10000) // total) if total else 10000
    assert int(got) == want, (a, b, c, d, got, want)


def test_fisher_exact_raises_past_cap(spark):
    from cascade_spark.operators.assoc_stats import _fisher_from_cells
    from cascade_spark.operators.inference_extra import _BINOM_N_CAP

    cells = spark.createDataFrame(
        [(_BINOM_N_CAP, 1, 1, 1)], "a long, b long, c long, d long"
    )
    with pytest.raises(Exception, match="decimal"):
        _fisher_from_cells(cells).collect()
