"""Property tests for the round-4 graph/interval/z-order primitives
against pure-Python references — correctness beyond the single fixture
the DuckDB oracle pins.

- PageRank: the Spark pipeline's exact-integer arithmetic must match a
  sequential Python power iteration bit-for-bit on arbitrary small
  graphs (not just the events fixture).
- Interval blocking: bucket-join + residual + distinct must equal the
  O(n^2) brute-force overlap set for random interval families.
- Z-value interleave: bijective on the 16-bit domain, and its bucket
  prefix bounds both dimensions (the data-skipping property).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from cascade_spark.operators.maintenance import _ZBITS, _zvalue_expr


# --- z-order: pure-python mirror of the shared arithmetic -------------------
def _zvalue_py(cb: int, db: int) -> int:
    z = 0
    for i in range(_ZBITS):
        z |= ((cb >> i) & 1) << (2 * i + 1)
        z |= ((db >> i) & 1) << (2 * i)
    return z


def test_zvalue_expr_matches_python_and_is_bijective():
    import duckdb

    con = duckdb.connect()
    expr = _zvalue_expr("cb", "db", "//")
    rows = con.sql(
        "SELECT cb, db, " + expr + " AS zv FROM "
        "(SELECT a.range AS cb, b.range AS db FROM range(0,256,17) a, range(0,256,13) b)"
    ).fetchall()
    seen = set()
    for cb, db, zv in rows:
        assert zv == _zvalue_py(cb, db), (cb, db)
        assert zv not in seen  # injective on the sampled grid
        seen.add(zv)


@settings(max_examples=200, deadline=None)
@given(cb=st.integers(0, 255), db=st.integers(0, 255))
def test_zvalue_bucket_prefix_bounds_both_dims(cb, db):
    # rows sharing a z-bucket (top 8 of 16 bits) agree on the top 4 bits
    # of BOTH dimensions -> per-bucket span <= 15 in each dimension
    z = _zvalue_py(cb, db)
    bucket = z >> 8
    # reconstruct the dimension high-nibbles from the bucket alone
    hi_cb = sum(((bucket >> (2 * i + 1)) & 1) << i for i in range(4))
    hi_db = sum(((bucket >> (2 * i)) & 1) << i for i in range(4))
    assert cb >> 4 == hi_cb
    assert db >> 4 == hi_db


# --- PageRank: Spark pipeline vs sequential Python reference ----------------
def _pagerank_py(edges, iters=3, total=1_000_000_000):
    """Sequential mirror of graph.graph_pagerank's integer arithmetic."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    tpn = total // len(nodes)
    base = (15 * tpn) // 100
    r = {n: tpn for n in nodes}
    for _ in range(iters):
        inflow = {n: 0 for n in nodes}
        for s, d, w in edges:
            inflow[d] += (r[s] * w) // outw[s]
        r = {n: base + (85 * inflow[n]) // 100 for n in nodes}
    return r


def test_pagerank_pipeline_matches_python_reference(spark):
    from pyspark.sql import functions as F

    from cascade_spark.operators._util import _intdiv

    # small weighted digraph where every node has an out-edge
    edges = [
        ("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 5),
        ("c", "d", 1), ("d", "a", 1), ("b", "a", 1),
    ]
    want = _pagerank_py(edges)

    e = spark.createDataFrame(edges, ["src", "dst", "w"])
    outw = e.groupBy("src").agg(F.sum("w").cast("long").alias("outw"))
    ef = e.join(outw, "src")
    nodes = (
        ef.select(F.col("src").alias("node"))
        .unionByName(ef.select(F.col("dst").alias("node")))
        .distinct()
    )
    total = 1_000_000_000
    scal = F.broadcast(
        nodes.agg(_intdiv(F.lit(total), F.count(F.lit(1))).alias("tpn")).select(
            "tpn", _intdiv(F.lit(15) * F.col("tpn"), F.lit(100)).alias("base")
        )
    )
    r = nodes.crossJoin(scal).select("node", F.col("tpn").alias("pr"))
    for _ in range(3):
        contrib = ef.join(r, ef["src"] == r["node"]).select(
            "dst", _intdiv(F.col("pr") * F.col("w"), F.col("outw")).alias("c")
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").cast("long").alias("inflow"))
        r = (
            nodes.join(inflow, nodes["node"] == inflow["dst"], "left")
            .crossJoin(scal)
            .select(
                "node",
                (
                    F.col("base")
                    + _intdiv(F.lit(85) * F.coalesce(F.col("inflow"), F.lit(0)), F.lit(100))
                ).alias("pr"),
            )
        )
    got = {row.node: row.pr for row in r.collect()}
    assert got == want


# --- interval blocking vs brute force ---------------------------------------
@settings(max_examples=15, deadline=None)
@given(
    ivs=st.lists(
        st.tuples(
            st.integers(0, 50),  # owner id
            st.integers(0, 10_000),  # start minute
            st.integers(0, 600),  # duration minutes
        ),
        min_size=0,
        max_size=40,
    )
)
def test_interval_blocking_equals_brute_force(spark, ivs):
    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    rows = [
        (uid, i, base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=s + d))
        for i, (uid, s, d) in enumerate(ivs)
    ]
    want = set()
    for ua, sa, s1, e1 in rows:
        for ub, sb, s2, e2 in rows:
            if ua < ub and s1 <= e2 and s2 <= e1:
                want.add((ua, sa, ub, sb))

    if not rows:
        assert want == set()
        return
    sess = spark.createDataFrame(rows, ["user_id", "sidx", "start_ts", "end_ts"])
    bucketed = sess.select(
        "user_id",
        "sidx",
        "start_ts",
        "end_ts",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "start_ts"),
                F.date_trunc("hour", "end_ts"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket"),
    )
    a = bucketed.select(
        F.col("user_id").alias("user_a"), F.col("sidx").alias("sidx_a"),
        F.col("start_ts").alias("start_a"), F.col("end_ts").alias("end_a"), "bucket",
    )
    b = bucketed.select(
        F.col("user_id").alias("user_b"), F.col("sidx").alias("sidx_b"),
        F.col("start_ts").alias("start_b"), F.col("end_ts").alias("end_b"), "bucket",
    )
    got = {
        (r.user_a, r.sidx_a, r.user_b, r.sidx_b)
        for r in (
            a.join(b, "bucket")
            .filter(
                (F.col("user_a") < F.col("user_b"))
                & (F.col("start_a") <= F.col("end_b"))
                & (F.col("start_b") <= F.col("end_a"))
            )
            .select("user_a", "sidx_a", "user_b", "sidx_b")
            .distinct()
            .collect()
        )
    }
    assert got == want


# --- media decoders: property tests against arbitrary payloads --------------
@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(1, 32),
    h=st.integers(1, 32),
    seed=st.integers(0, 2**31),
)
def test_ppm_decode_roundtrip_arbitrary_images(w, h, seed):
    import random

    from cascade_spark.operators.multimodal import decode_ppm

    rng = random.Random(seed)
    px = bytes(rng.randrange(256) for _ in range(3 * w * h))
    blob = f"P6\n{w} {h}\n255\n".encode() + px
    got_w, got_h, mv, nb, psum = decode_ppm(blob)
    assert (got_w, got_h, mv, nb) == (w, h, 255, 3 * w * h)
    assert psum == sum(px)


@settings(max_examples=100, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=256),
)
def test_wav_decode_roundtrip_arbitrary_audio(rate, samples):
    import struct

    from cascade_spark.operators.multimodal import decode_wav

    data = struct.pack(f"<{len(samples)}h", *samples)
    blob = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    n_ch, got_rate, n, sum_sq = decode_wav(blob)
    assert (n_ch, got_rate, n) == (1, rate, len(samples))
    assert sum_sq == sum(s * s for s in samples)
