"""Semantic guarantees of the sketch operators beyond oracle equality:
the Bloom pass can never miss a truly-contaminated shingle (no false
negatives), CMS never under-counts, and the ACF is a valid correlation
profile (Cauchy-Schwarz bound)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cascade_spark.plans.registry import load_all


def test_bloom_has_no_false_negatives(spark, sf_dir):
    # every exact-shared shingle must also be bloom-flagged, per doc
    from cascade_spark.operators.decontam import _bench_flag
    from cascade_spark.operators.dedup import _shingles
    from cascade_spark.operators.sketches import BLOOM_K, BLOOM_M, _h
    from cascade_spark.operators._util import t

    d = t(spark, sf_dir, "documents")
    bench_sh = _shingles(d.filter(_bench_flag())).select("s").distinct()
    corp = _shingles(d.filter(~_bench_flag()))
    pos_sets = [
        set(
            r[0]
            for r in bench_sh.select(
                (_h(F.col("s"), f"#{i}") % BLOOM_M).alias("p")
            ).collect()
        )
        for i in range(BLOOM_K)
    ]
    sample = corp.join(bench_sh.withColumn("_hit", F.lit(1)), "s", "left").limit(2000)
    for row in sample.collect():
        if row["_hit"] is not None:
            import hashlib

            for i in range(BLOOM_K):
                h = int(hashlib.md5((row["s"] + f"#{i}").encode()).hexdigest()[:8], 16)
                assert h % BLOOM_M in pos_sets[i], (row["s"], i)


def test_bloom_fp_column_nonnegative(spark, sf_dir):
    df = load_all()["pipeline_decontaminate_bloom"].builder(spark, sf_dir)
    bad = df.filter(
        (F.col("bloom_fp") < 0) | (F.col("n_bloom") < F.col("n_exact"))
    ).count()
    assert bad == 0


def test_cms_never_undercounts(spark, sf_dir):
    df = load_all()["profile_cms_heavy_hitters"].builder(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["overestimate"] >= 0
        assert r["cms_est"] >= r["exact_count"]


def test_acf_cauchy_schwarz_bound(spark, sf_dir):
    # counts are nonnegative, so 0 <= sum(c_t * c_{t-L}) <= sum(c_t^2)
    # and the floor-bp normalization lands in [0, 10000]
    df = load_all()["events_autocorrelation"].builder(spark, sf_dir)
    rows = df.collect()
    assert [r["lag"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert 0 <= r["acf_bp"] <= 10000, r
