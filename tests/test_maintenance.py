"""Compaction, schema evolution, and tolerance checks for the
approximate (rows-only) operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from cascade_spark.plans.compare import duckdb_connection
from cascade_spark.plans.registry import load_all
from cascade_spark.tables import load

REG = load_all()


def test_compact_topic_preserves_content(spark, sf_dir, tmp_path):
    from cascade_spark.operators.ingest import publish
    from cascade_spark.operators.maintenance import compact_topic

    ev = load(spark, sf_dir, "events").limit(500)
    topic = str(tmp_path / "topic_frag")
    # three appends × 8 partitions → many small files
    for _ in range(3):
        publish(ev.limit(100), topic, order_cols=["ts", "event_id"], num_partitions=8)
    before_rows = spark.read.parquet(topic).count()
    files_before, files_after = compact_topic(spark, topic, target_files=2)
    assert files_before > files_after
    assert files_after <= 2
    assert spark.read.parquet(topic).count() == before_rows


def test_schema_evolution_merge_schema(spark, sf_dir, tmp_path):
    out = str(tmp_path / "evolving")
    ev = load(spark, sf_dir, "events").limit(50)
    ev.select("event_id", "event_type").write.mode("append").parquet(out)
    ev.select(
        "event_id", "event_type", F.lit("v2").alias("producer_version")
    ).write.mode("append").parquet(out)
    merged = spark.read.option("mergeSchema", True).parquet(out)
    assert "producer_version" in merged.columns
    assert merged.count() == 100
    # old files surface the new column as NULL
    assert merged.filter(F.col("producer_version").isNull()).count() == 50


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    got = {
        r["event_type"]: r["approx_users"]
        for r in REG["agg_approx_count_distinct"].builder(spark, sf_dir).collect()
    }
    con = duckdb_connection(sf_dir)
    exact = dict(
        con.sql(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY event_type"
        ).fetchall()
    )
    con.close()
    for k, v in exact.items():
        assert abs(got[k] - v) <= max(2, 0.05 * v), (k, got[k], v)


def test_percentile_approx_within_tolerance(spark, sf_dir):
    rows = REG["agg_percentile_approx"].builder(spark, sf_dir).collect()
    con = duckdb_connection(sf_dir)
    exact = {
        r[0]: r[1:]
        for r in con.sql(
            """SELECT l_returnflag,
                      QUANTILE_CONT(l_extendedprice, 0.25),
                      QUANTILE_CONT(l_extendedprice, 0.5),
                      QUANTILE_CONT(l_extendedprice, 0.75)
               FROM lineitem GROUP BY l_returnflag"""
        ).fetchall()
    }
    con.close()
    for r in rows:
        for got, want in zip((r["q25"], r["q50"], r["q75"]), exact[r["l_returnflag"]]):
            assert abs(got - float(want)) <= 0.02 * float(want), (r["l_returnflag"], got, want)
