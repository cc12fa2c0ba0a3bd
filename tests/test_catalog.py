"""Topic catalog semantics (reference R8-R10, src/coordinator/*)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cascade_spark import catalog
from cascade_spark.catalog import AnalysisException


def test_register_lookup_list_drop(spark, sf_dir, tmp_path):
    from cascade_spark.operators.ingest import publish
    from cascade_spark.tables import load

    ev = load(spark, sf_dir, "events").limit(50)
    topic_dir = str(tmp_path / "t1")
    publish(ev, topic_dir, order_cols=["ts", "event_id"], num_partitions=2)

    catalog.register_topic(spark, "t1", topic_dir)
    assert catalog.topic_exists(spark, "t1")
    assert "t1" in catalog.list_topics(spark)
    assert catalog.get_topic(spark, "t1").count() == 50
    # re-registration is idempotent (reference's dead already-registered
    # branch, src/coordinator/main.rs:48-54 — intended semantics: upsert)
    catalog.register_topic(spark, "t1", topic_dir)
    assert catalog.get_topic(spark, "t1").count() == 50

    assert catalog.drop_topic(spark, "t1")
    assert not catalog.topic_exists(spark, "t1")


def test_unknown_topic_raises(spark):
    # coordinator unwrap-panics on unknown topic (brokermap.rs:50);
    # our analog is AnalysisException
    with pytest.raises(AnalysisException):
        catalog.get_topic(spark, "never_registered").collect()


def test_offsets_per_partition_kafka_model(spark, sf_dir):
    from cascade_spark.operators.ingest import assign_partitioned_offsets
    from cascade_spark.tables import load

    ev = load(spark, sf_dir, "events")
    out = assign_partitioned_offsets(ev, F.col("user_id"), 4, ["ts", "event_id"])
    # offsets dense within each partition
    agg = out.groupBy("partition").agg(
        F.count(F.lit(1)).alias("n"), F.max("offset").alias("mx"), F.min("offset").alias("mn")
    )
    for row in agg.collect():
        assert row["mn"] == 0
        assert row["mx"] == row["n"] - 1


def test_persistent_registry_partition_pruning_plan(spark, sf_dir):
    """Consume by (topic, partition) must prune at planning time: both
    predicates appear as PartitionFilters and pruned file counts shrink."""
    from cascade_spark.catalog import consume_topic_partitions
    from cascade_spark.sources.topics import stage_topic_registry

    table, _ = stage_topic_registry(spark, sf_dir)
    df = consume_topic_partitions(spark, table, "events", [1, 3])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    frag = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "topic" in frag and "= events" in frag, frag
    assert "partition" in frag and "IN (1,3)" in frag.replace(" ", "").replace("IN(", "IN ("), frag
    # pruning is real: only the two requested partitions' rows come back
    assert df.select("partition").distinct().count() == 2


def test_persistent_registry_survives_new_session(spark, sf_dir):
    """The external table outlives the session that registered it (temp
    views don't) — the coordinator's registry made durable."""
    from cascade_spark.sources.topics import stage_topic_registry

    table, root = stage_topic_registry(spark, sf_dir)
    catalog.register_topic(spark, "volatile_demo", root + "/topic=events/partition=0")
    fresh = spark.newSession()
    # persistent registration visible in the fresh session
    assert fresh.catalog.tableExists(table)
    assert fresh.table(table).limit(1).count() == 1
    # session-scoped temp view is NOT
    assert not fresh.catalog.tableExists("topic_volatile_demo")
    # and a cold process re-registers from the layout alone
    from cascade_spark.catalog import register_persistent_topic

    again = register_persistent_topic(fresh, table + "_again", root)
    assert again.groupBy("topic").count().count() == 2
