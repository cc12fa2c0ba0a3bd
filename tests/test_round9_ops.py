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


def test_pettitt_midrank_identity():
    """U_t = sum_{i<=t} dr_i - (t+1)(n+1) (doubled midranks) equals the
    direct O(n^2) pair sum, ties included — the identity
    events_pettitt_changepoint rides (oracle and plan both use it, so
    this is the independent ground-truth check)."""
    import numpy as np

    rng = np.random.default_rng(7)
    for _ in range(100):
        n = int(rng.integers(2, 40))
        v = rng.integers(0, 6, n)
        sgn = np.sign(v[:, None] - v[None, :])
        direct = [int(sgn[: t + 1, t + 1 :].sum()) for t in range(n - 1)]
        dr = np.array(
            [2 * int((v < x).sum()) + int((v == x).sum()) + 1 for x in v]
        )
        via_rank = [
            int(dr[: t + 1].sum() - (t + 1) * (n + 1)) for t in range(n - 1)
        ]
        assert direct == via_rank


def test_hamming_code_fold_matches_python(spark):
    """The MSB-first sign-code fold in similarity_hamming_topk equals a
    direct Python bit build on an arbitrary 64-dim vector."""
    from cascade_spark.operators.vector_geometry import _SPARK_CODE

    vec = [((-1) ** i) * (0.01 * i + 0.001) for i in range(64)]
    vec[0], vec[63] = -0.5, 0.25  # pin both edge bits
    df = spark.createDataFrame([(vec,)], "embedding array<float>")
    row = df.select(
        F.expr(_SPARK_CODE.format(off=1)).alias("hi"),
        F.expr(_SPARK_CODE.format(off=33)).alias("lo"),
    ).first()

    def code(xs):
        acc = 0
        for x in xs:
            acc = acc * 2 + (1 if x >= 0 else 0)
        return acc

    assert row["hi"] == code(vec[:32])
    assert row["lo"] == code(vec[32:])


def test_bm25_integer_ratio_equals_fraction():
    """(44*T*tf) // (20*tf*T + 6*T + 18*dl*N) is exactly
    floor(tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))) for k1=6/5, b=3/4,
    avgdl=T/N — the clearing used by text_bm25_topk."""
    from fractions import Fraction

    for tf, dl, t_corp, n in [
        (1, 10, 1000, 20),
        (7, 55, 27500, 500),
        (200, 200, 2750000, 50000),
        (3, 48, 1534, 17),
    ]:
        k1, b = Fraction(6, 5), Fraction(3, 4)
        avgdl = Fraction(t_corp, n)
        exact = (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * Fraction(dl) / avgdl))
        cleared = (44 * t_corp * tf) // (20 * tf * t_corp + 6 * t_corp + 18 * dl * n)
        assert cleared == exact.numerator // exact.denominator
        # and the micro-scaled per-term score stays a faithful floor
        assert abs(float(exact) - cleared) < 1


def test_winnowing_key_roundtrip():
    """key = h*65536 - pos encodes (min h, rightmost pos) as one
    integer min and decodes losslessly for every pos in the declared
    cap — the argmin trick in text_winnowing_fingerprint."""
    cap = 65_536
    for h in [0, 1, 77, 2**32 - 1]:
        for pos in [0, 1, 2, cap - 1]:
            key = h * cap - pos
            assert (key + cap - 1) // cap == h
            assert h * cap - key == pos
    # ordering: smaller hash always wins; equal hash -> larger pos wins
    assert (5 * cap - 3) < (6 * cap - 9)
    assert (5 * cap - 9) < (5 * cap - 3)


def test_skyline_staircase_equals_bruteforce(spark):
    """analytics_pareto_frontier's staircase (strictly-lower min price
    than every larger size) equals the O(n^2) dominance definition on
    adversarial point sets with ties."""
    import itertools

    import numpy as np

    rng = np.random.default_rng(11)
    for _ in range(50):
        n = int(rng.integers(1, 30))
        pts = [(int(s), int(p)) for s, p in
               zip(rng.integers(1, 8, n), rng.integers(1, 8, n))]
        # brute force: non-dominated = no other point with
        # (size >=, price <=) and one strict
        brute = {
            (s, p)
            for (s, p) in pts
            if not any(
                (s2 >= s and p2 <= p and (s2 > s or p2 < p))
                for (s2, p2) in pts
            )
        }
        # staircase: per-size min price, kept iff strictly below the min
        # over larger sizes; surviving points are (size, minp) members
        minp = {}
        for s, p in pts:
            minp[s] = min(minp.get(s, p), p)
        stair = {
            (s, mp)
            for s, mp in minp.items()
            if all(minp[s2] > mp for s2 in minp if s2 > s)
        }
        assert brute == stair, (pts, brute, stair)


def test_rolling_slope_matches_polyfit():
    """The constant-denominator integer slope equals numpy's OLS slope
    (scaled by 1e6, floored) on arbitrary 14-day windows."""
    import numpy as np

    rng = np.random.default_rng(3)
    t = np.arange(14)
    den = int(14 * (t * t).sum() - t.sum() ** 2)
    assert den == 3185
    for _ in range(50):
        v = rng.integers(0, 1000, 14).astype(np.int64)
        a = int((t * v).sum())
        b = int(v.sum())
        got = (14 * a - 91 * b) * 1_000_000 // den
        want_float = np.polyfit(t, v, 1)[0]
        assert abs(got / 1e6 - want_float) < 1e-6


def test_zlib_ratio_properties(spark, sf_dir):
    """text_zlib_compression_ratio: ratios live in a sane band for
    word-salad text, and a highly repetitive payload compresses FAR
    better than the fixture average (the signal the filter relies on)."""
    import zlib

    from cascade_spark.plans.registry import load_all

    rows = (
        load_all()["text_zlib_compression_ratio"]
        .builder(spark, sf_dir)
        .collect()
    )
    assert rows
    for r in rows:
        assert r["raw_bytes"] > 0
        assert 0 < r["weighted_ratio_bp"] < 10_000 + 2_000  # tiny docs may expand
    # repetition monotonicity of the underlying signal
    rep = ("spam " * 200).encode()
    mixed = ("the quick brown fox jumps over the lazy dog " * 22).encode()
    assert len(zlib.compress(rep, 6)) < len(zlib.compress(mixed, 6))
