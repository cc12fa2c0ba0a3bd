"""Semantic tests for the round-4 additions: PageRank invariants,
z-order span bounds, OHLC bar edge cases, LM-commonality invariants.
(Oracle equality for all of these is covered by test_oracle.py's
full-registry parametrization; these pin the properties an oracle
diff would not explain well.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from cascade_spark.plans.registry import load_all


def test_pagerank_mass_conserved_and_types_rank_top(spark, sf_dir):
    from cascade_spark.operators.graph import _TOTAL, _pagerank_frames

    reg = load_all()
    top = reg["graph_pagerank"].builder(spark, sf_dir).collect()
    assert len(top) == 20
    # the 5 event-type hubs aggregate user mass — they must be the head
    assert all(r.node.startswith("t:") for r in top[:5])
    # rank mass is conserved up to floor-division loss: each of the 3
    # iterations loses < 1 nano-unit per edge (contrib floor) plus 1 per
    # node (damping floor); bound the drift loosely
    _, nodes = _pagerank_frames(spark, sf_dir)
    n_nodes = nodes.count()
    # recompute full rank frame (not just top-20) for the mass check
    import cascade_spark.operators.graph as G

    full = None
    orig = G._ITERS
    # builder returns top-20; reuse internals for the full frame
    e, nodes_df = _pagerank_frames(spark, sf_dir)
    from cascade_spark.operators._util import _intdiv

    scal = F.broadcast(
        nodes_df.agg(_intdiv(F.lit(_TOTAL), F.count(F.lit(1))).alias("tpn")).select(
            "tpn", _intdiv(F.lit(15) * F.col("tpn"), F.lit(100)).alias("base")
        )
    )
    r = nodes_df.crossJoin(scal).select("node", F.col("tpn").alias("pr"))
    for _ in range(orig):
        contrib = e.join(r, e["src"] == r["node"]).select(
            "dst", _intdiv(F.col("pr") * F.col("w"), F.col("outw")).alias("c")
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").cast("long").alias("inflow"))
        r = (
            nodes_df.join(inflow, nodes_df["node"] == inflow["dst"], "left")
            .crossJoin(scal)
            .select(
                "node",
                (
                    F.col("base")
                    + _intdiv(
                        F.lit(85) * F.coalesce(F.col("inflow"), F.lit(0)), F.lit(100)
                    )
                ).alias("pr"),
            )
        )
    mass = r.agg(F.sum("pr")).collect()[0][0]
    n_edges = e.count()
    max_loss = orig * (n_edges + 2 * n_nodes + 200)
    assert _TOTAL - max_loss <= mass <= _TOTAL
    assert r.count() == n_nodes


def test_zorder_spans_bounded(spark, sf_dir):
    reg = load_all()
    rows = reg["maintenance_zorder_cluster"].builder(spark, sf_dir).collect()
    assert rows, "expected non-empty z-bucket audit"
    # 256 z-range buckets over a 16-bit z-value leave 4 bits per
    # dimension inside a bucket -> every span is <= 15. This is the
    # data-skipping guarantee the layout exists for.
    for r in rows:
        assert 0 <= r.span_cb <= 15, r
        assert 0 <= r.span_db <= 15, r


def test_ohlc_single_row_bucket_open_equals_close(spark):
    import pandas as pd

    from cascade_spark.operators.timeseries import events_resample_ohlc
    import tempfile, os

    # synthetic: one bucket with 3 rows, one bucket with a single row
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 01:00:00",
                    "2024-01-01 02:00:00",
                    "2024-01-01 03:00:00",
                    "2024-01-02 01:00:00",
                ]
            ),
            "user_id": [1, 1, 1, 1],
            "event_type": ["click"] * 4,
            "value": [10.0, 99.0, 20.0, 7.0],
            "props": ["{}"] * 4,
        }
    )
    d = tempfile.mkdtemp(prefix="cascade_ohlc_")
    spark.createDataFrame(pdf).write.parquet(os.path.join(d, "events.parquet"))
    out = {(r.day, r.event_type): r for r in events_resample_ohlc(spark, d).collect()}
    b1 = out[("2024-01-01", "click")]
    assert (b1.open, b1.high, b1.low, b1.close, b1.volume) == (10.0, 99.0, 10.0, 20.0, 3)
    b2 = out[("2024-01-02", "click")]
    assert b2.open == b2.close == b2.high == b2.low == 7.0 and b2.volume == 1


def test_lm_commonality_invariants(spark, sf_dir):
    reg = load_all()
    df = reg["text_lm_commonality"].builder(spark, sf_dir)
    rows = df.collect()
    assert rows
    # every bigram occurs at least once (itself) -> score >= 1; and the
    # doc's bigram count is positive for every scored doc
    assert all(r.mean_bigram_freq >= 1.0 and r.n_bigrams > 0 for r in rows)


def test_salted_join_matches_plain_join(spark, sf_dir):
    reg = load_all()
    salted = reg["join_salted_skew"].builder(spark, sf_dir)
    from cascade_spark.operators._util import d2, dec, t

    ev = t(spark, sf_dir, "events")
    dim = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        ev.join(dim, ev["user_id"] == dim["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            d2(F.sum(dec("value"))).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )
    assert [tuple(r) for r in salted.collect()] == [tuple(r) for r in plain.collect()]


def test_ppm_decoder_is_a_real_parser():
    import pytest

    from cascade_spark.operators.multimodal import decode_ppm, synth_ppm

    # hand-built image, decoder never sees the generation parameters
    blob = b"P6\n2 2\n255\n" + bytes(range(12))
    w, h, mv, nb, psum = decode_ppm(blob)
    assert (w, h, mv, nb) == (2, 2, 255, 12)
    assert psum == sum(range(12))
    # synth round-trip
    for doc_id in (0, 7, 123456):
        w, h, mv, nb, psum = decode_ppm(synth_ppm(doc_id))
        assert (w, h) == (4 + doc_id % 13, 3 + doc_id % 7)
        assert nb == 3 * w * h
    # garbage rejected, not fake-decoded
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255\n" + bytes(12))
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n4 4\n255\n" + bytes(5))  # truncated


def test_wav_decoder_is_a_real_parser():
    import struct

    import pytest

    from cascade_spark.operators.multimodal import decode_wav, synth_wav

    # hand-built 2-sample mono 8k WAV
    data = struct.pack("<2h", -5, 7)
    blob = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    assert decode_wav(blob) == (1, 8000, 2, 25 + 49)
    # synth round-trip
    for doc_id in (0, 5, 99999):
        n_ch, rate, n_samples, sum_sq = decode_wav(synth_wav(doc_id))
        assert n_ch == 1 and rate == 8000 + (doc_id % 3) * 4000
        assert n_samples == 64 + doc_id % 129
    # wrong container / wrong codec rejected
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + bytes(40))
    bad_fmt = blob.replace(struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16),
                           struct.pack("<IHHIIHH", 16, 3, 1, 8000, 16000, 2, 16))
    with pytest.raises(ValueError):
        decode_wav(bad_fmt)


def test_video_decoder_is_a_real_parser():
    """decode_video walks the PVID container and each embedded P6 frame
    from raw bytes — hand-built, wrong-magic, and truncated payloads."""
    import pytest

    from cascade_spark.operators.multimodal import decode_video, synth_video

    # hand-built 2-frame 1x1 container: frame pixel sums 1+2+3, 4+5+6
    blob = b"PVID\n2\n" + b"P6\n1 1\n255\n" + bytes([1, 2, 3]) + b"P6\n1 1\n255\n" + bytes([4, 5, 6])
    frames = list(decode_video(blob))
    assert frames == [(0, 1, 1, 6), (1, 1, 1, 15)]

    for doc_id in (0, 7, 123):
        fr = list(decode_video(synth_video(doc_id)))
        assert len(fr) == 2 + doc_id % 5
        w, h = 4 + doc_id % 13, 3 + doc_id % 7
        assert all(f[1] == w and f[2] == h for f in fr)
        assert fr[0][3] == sum((doc_id * 31 + i) % 256 for i in range(3 * w * h))

    with pytest.raises(ValueError):
        list(decode_video(b"RIFF\n2\n"))
    with pytest.raises(ValueError):
        list(decode_video(b"PVID\n1\nP6\n2 2\n255\n" + bytes(5)))  # truncated
    with pytest.raises(ValueError):
        list(decode_video(b"PVID\n2\nP6\n1 1\n255\n" + bytes(3)))  # missing frame 2


def test_bpe_wrapped_replace_equals_greedy_merge():
    """The `<t1><t2>` REPLACE trick must equal the textbook greedy
    left-to-right non-overlapping BPE merge on token lists — property-
    tested over random words (pure semantics, no Spark)."""
    from hypothesis import given, strategies as st

    def wrap(tokens):
        return "".join(f"<{t}>" for t in tokens)

    def unwrap(s):
        return s[1:-1].split("><") if s else []

    def greedy_merge(tokens, a, b):
        out, i = [], 0
        while i < len(tokens):
            if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(tokens[i])
                i += 1
        return out

    alpha = st.sampled_from("ab")  # tiny alphabet maximizes overlap cases

    @given(
        st.lists(st.text(alpha, min_size=1, max_size=2), min_size=0, max_size=8),
        st.text(alpha, min_size=1, max_size=2),
        st.text(alpha, min_size=1, max_size=2),
    )
    def check(tokens, a, b):
        replaced = wrap(tokens).replace(f"<{a}><{b}>", f"<{a + b}>")
        assert unwrap(replaced) == greedy_merge(tokens, a, b)

    check()


def test_peak_concurrency_matches_brute_force(spark):
    """The two-phase sweep line must equal the O(n^2) brute-force peak
    on a hand-rolled interval set with ties, containment, and an
    instantaneous (start == end) session."""
    import pandas as pd

    from cascade_spark.operators.ingest import assign_prefix_sum
    from pyspark.sql import functions as F

    iv = [(0, 10), (5, 15), (10, 20), (10, 10), (12, 13), (30, 40), (30, 40)]
    # brute force on the closed intervals, probing every endpoint
    points = sorted({p for s, e in iv for p in (s, e)})
    brute = max(sum(1 for s, e in iv if s <= p <= e) for p in points)

    sess = spark.createDataFrame(iv, "s long, e long")
    pts = sess.select(F.col("s").alias("pt"), F.lit(1).alias("delta")).unionByName(
        sess.select((F.col("e") + 1).alias("pt"), F.lit(-1).alias("delta"))
    )
    net = pts.groupBy("pt").agg(F.sum("delta").cast("long").alias("net"))
    curve = assign_prefix_sum(net, ["pt"], "net").select(
        "pt", (F.col("prefix_sum") + F.col("net")).alias("conc")
    )
    assert curve.agg(F.max("conc")).collect()[0][0] == brute == 4


def test_isqrt_exact_for_random_n():
    """The float-sqrt-plus-correction isqrt must equal math.isqrt for
    arbitrary bigint counts (the temperature-mixture determinism
    claim), including perfect squares and off-by-one boundaries."""
    import math

    from hypothesis import given, strategies as st

    def isqrt_like(n: int) -> int:
        s0 = int(math.floor(math.sqrt(float(n))))
        if (s0 + 1) * (s0 + 1) <= n:
            return s0 + 1
        if s0 * s0 > n:
            return s0 - 1
        return s0

    @given(st.integers(min_value=0, max_value=2**52))
    def check(n):
        assert isqrt_like(n) == math.isqrt(n)

    check()
    for k in range(1, 10**6, 99991):  # sweep incl. squares around boundaries
        assert isqrt_like(k * k) == k
        assert isqrt_like(k * k - 1) == k - 1
