"""Round-11 operator property tests — independent recomputation in
plain Python over the collected fixture rows (the suite's standard
second layer next to the DuckDB oracle parity in tests/test_oracle.py).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from cascade_spark.plans.registry import load_all
from cascade_spark.tables import load


def test_theta_sketch_exact_regime_matches_set_algebra(spark, sf_dir):
    """In the exact regime (distinct <= 2^lgK nominal entries) every
    theta estimate must equal the true set cardinality — recomputed
    with Python sets, not SQL."""
    ev = load(spark, sf_dir, "events").select("event_type", "user_id").collect()
    per = defaultdict(set)
    for r in ev:
        per[r["event_type"]].add(r["user_id"])
    rows = load_all()["agg_theta_sketch_distinct"].builder(spark, sf_dir).collect()
    got = {r["event_type"]: r["n_users"] for r in rows}
    want = {t: len(s) for t, s in per.items()}
    want["ALL"] = len(set().union(*per.values()))
    assert got == want

    row = load_all()["agg_theta_sketch_setops"].builder(spark, sf_dir).collect()[0]
    c, p = per["click"], per["purchase"]
    assert row["n_click"] == len(c)
    assert row["n_purchase"] == len(p)
    assert row["n_both"] == len(c & p)
    assert row["n_click_only"] == len(c - p)


def test_theta_sketch_beyond_cap_is_tolerance_only(spark):
    """The declared contract edge: past 2^lgK nominal entries the
    sketch samples and the estimate is approximate — pin that the
    declared cap is real (small-lgK sketch over more distincts than
    nominal entries stays within ~5% but is no longer trusted exact),
    so the doc's exact-regime claim has a tested boundary."""
    n = 40_000
    df = spark.range(0, n)
    est = df.agg(
        F.theta_sketch_estimate(F.theta_sketch_agg("id", 12)).alias("e")
    ).collect()[0]["e"]
    assert abs(est - n) <= 0.05 * n
    # and the exact regime really is exact at the SAME lgK below cap
    m = 3_000
    est2 = (
        spark.range(0, m)
        .agg(F.theta_sketch_estimate(F.theta_sketch_agg("id", 12)).alias("e"))
        .collect()[0]["e"]
    )
    assert est2 == m


def test_collated_distinct_matches_python_casefold(spark, sf_dir):
    """UTF8_LCASE distinct == distinct of lowercased strings (ASCII
    fixture), and must differ from binary distinct on every group of
    the mixed-case corpus."""
    names = [r["n_name"] for r in load(spark, sf_dir, "nation").collect()]
    corpus = names + [s.lower() for s in names]
    groups = defaultdict(list)
    for s in corpus:
        groups[s[-1].lower()].append(s)
    rows = load_all()["sort_collated_order"].builder(spark, sf_dir).collect()
    assert len(rows) == len(groups)
    for r in rows:
        g = groups[r["last_char"]]
        assert r["n_rows"] == len(g)
        assert r["n_distinct_ci"] == len({s.lower() for s in g})
        assert r["n_distinct_binary"] == len(set(g))
        assert r["n_distinct_ci"] < r["n_distinct_binary"]
        assert r["min_name_ci"] == min(s.lower() for s in g)


def test_state_snapshot_is_newer_half_plus_marker(spark, sf_dir):
    """State as of batch 1 == hour x type counts of the newer half of
    events plus the single pusher-marker key — recomputed from the raw
    events rows in Python."""
    ev = load(spark, sf_dir, "events").select("ts", "event_type").collect()
    times = sorted(r["ts"] for r in ev)
    lo, hi = times[0], times[-1]
    lo_us = int(lo.timestamp() * 1_000_000)
    hi_us = int(hi.timestamp() * 1_000_000)
    cut_us = lo_us + (hi_us - lo_us) // 2
    per = defaultdict(lambda: [0, set()])
    for r in ev:
        if int(r["ts"].timestamp() * 1_000_000) >= cut_us:
            slot = per[r["event_type"]]
            slot[0] += 1
            slot[1].add(r["ts"].replace(minute=0, second=0, microsecond=0))
    rows = (
        load_all()["stream_state_snapshot_read"].builder(spark, sf_dir).collect()
    )
    got = {r["event_type"]: (r["n_keys"], r["n_events"]) for r in rows}
    assert got.pop("sentinel") == (1, 1)
    want = {t: (len(s[1]), s[0]) for t, s in per.items()}
    assert got == want
