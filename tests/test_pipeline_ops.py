"""Semantics tests for the round-2 pipeline operators: benchmark
decontamination, PII scrubbing, stratified sampling, sequence-length
histogram (the oracle hash checks live in the registry; these pin the
properties the hashes alone don't state)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cascade_spark.operators.decontam import _bench_flag, pipeline_decontaminate
from cascade_spark.operators.pii import TERM_RE, pipeline_pii_scrub
from cascade_spark.operators.curation import pipeline_stratified_sample
from cascade_spark.operators.text import text_seqlen_histogram
from cascade_spark.operators._util import t


def test_decontaminate_excludes_benchmark_docs(spark, sf_dir):
    """Benchmark docs are never flagged as contaminated (they ARE the
    benchmark), and every flagged doc meets the 20% overlap rule."""
    out = pipeline_decontaminate(spark, sf_dir).collect()
    bench_ids = {
        r.doc_id
        for r in t(spark, sf_dir, "documents").filter(_bench_flag()).select("doc_id").collect()
    }
    for r in out:
        assert r.doc_id not in bench_ids
        assert r.n_shared * 5 >= r.n_shingles
        assert 0.0 <= r.overlap <= 1.0


def test_pii_scrub_redaction_is_complete(spark, sf_dir):
    """After redaction no sensitive-term matches remain, and the scrub
    stats agree with an independent recount."""
    d = t(spark, sf_dir, "documents")
    red = F.regexp_replace(F.col("text"), TERM_RE, "[REDACTED]")
    leftover = d.select(F.sum(F.regexp_count(red, F.lit(TERM_RE))).alias("n")).collect()[0].n
    assert leftover == 0
    out = {r.source: r for r in pipeline_pii_scrub(spark, sf_dir).collect()}
    recount = {
        r.source: (r.docs, r.hits)
        for r in d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum((F.regexp_count(F.col("text"), F.lit(TERM_RE)) > 0).cast("int")).alias("hits"),
        )
        .collect()
    }
    for src, (docs, hits) in recount.items():
        assert out[src].n_docs == docs
        assert out[src].docs_redacted == hits  # email/phone are 0 in the fixture


def test_stratified_sample_size_and_determinism(spark, sf_dir):
    out1 = pipeline_stratified_sample(spark, sf_dir).collect()
    out2 = pipeline_stratified_sample(spark, sf_dir).collect()
    assert out1 == out2  # reproducible: no RNG, no partition sensitivity
    per = {}
    for r in out1:
        per.setdefault(r.source, []).append(r.rk)
    n_strata = t(spark, sf_dir, "documents").select("source").distinct().count()
    assert len(per) == n_strata
    for src, rks in per.items():
        assert rks == list(range(1, len(rks) + 1))  # dense ranks from 1
        assert len(rks) <= 25


def test_seqlen_histogram_accounts_every_doc(spark, sf_dir):
    rows = text_seqlen_histogram(spark, sf_dir).collect()
    d = t(spark, sf_dir, "documents")
    n_docs = d.count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert rows[-1].cum_docs == n_docs  # cumulative closes the distribution
    for r in rows:
        assert r.bucket * 16 <= r.min_tokens <= r.max_tokens < (r.bucket + 1) * 16
