"""Topic catalog — the coordinator's registry, Spark-native.

Reference semantics (SURVEY.md §2A R8-R10): the coordinator keeps an
in-memory topic → brokers map (src/coordinator/brokermap.rs:5) with
register / lookup / remove RPCs (src/coordinator/main.rs:36-82). Spark's
catalog replaces all of it: a topic is a registered table over its
parquet directory; lookup of an unknown topic raises AnalysisException —
matching the coordinator's panic-on-unknown-topic
(src/coordinator/brokermap.rs:50).

Two registry tiers, matching the coordinator's *intended* form — a
``(broker, partition) → topic`` map (src/coordinator/main.rs:43-45 TODO):

- temp views (``register_topic``): session-scoped, like the reference's
  volatile in-memory map;
- the **persistent partitioned layout** (``publish_partitioned`` +
  ``register_persistent_topic``): one parquet root laid out
  ``topic=<t>/partition=<p>/`` with an external catalog table on top.
  The directory layout is the durable registry state (exactly as the
  reference's append-only logs outlive its volatile broker map): any
  session re-registers from the path alone, the catalog entry survives
  ``SparkSession.newSession()``, and every query that filters on
  (topic, partition) prunes to just those directories — a consume by
  (topic, partition) never scans other topics' data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def register_topic(spark: SparkSession, topic: str, topic_dir: str) -> None:
    """R8: register a topic backed by a parquet directory."""
    spark.read.parquet(topic_dir).createOrReplaceTempView(f"topic_{topic}")


def topic_exists(spark: SparkSession, topic: str) -> bool:
    return spark.catalog.tableExists(f"topic_{topic}")


def get_topic(spark: SparkSession, topic: str) -> DataFrame:
    """R9: metadata/handle lookup; AnalysisException on unknown topic
    (the reference coordinator unwrap-panics, brokermap.rs:50)."""
    return spark.table(f"topic_{topic}")


def list_topics(spark: SparkSession) -> list[str]:
    """R10: enumerate registered topics."""
    return sorted(
        t.name.removeprefix("topic_")
        for t in spark.catalog.listTables()
        if t.name.startswith("topic_")
    )


def drop_topic(spark: SparkSession, topic: str) -> bool:
    """R10 remove: drop the registration (data files are untouched —
    the reference never deletes log files either)."""
    return spark.catalog.dropTempView(f"topic_{topic}")


def publish_partitioned(
    df: DataFrame, root: str, topic: str, num_partitions: int = 4, key: str = "event_id"
) -> None:
    """Append a batch into the persistent registry layout: rows are
    assigned ``partition = pmod(hash_key, P)`` (the Kafka key-hash form
    of the producer's round-robin, deterministic for replays) and written
    ``partitionBy(topic, partition)`` so partition pruning is a directory
    listing, not a scan."""
    (
        df.withColumn("topic", F.lit(topic))
        .withColumn("partition", F.pmod(F.col(key), F.lit(num_partitions)).cast("int"))
        .write.mode("append")
        .partitionBy("topic", "partition")
        .parquet(root)
    )


def register_persistent_topic(spark: SparkSession, table: str, root: str) -> DataFrame:
    """Register the partitioned layout as a persistent external catalog
    table (survives newSession(); any process re-registers from the path
    — the layout is the durable state). ``recoverPartitions`` ingests the
    (topic, partition) directory tree into the catalog's partition map —
    the realized (broker, partition) → topic registry."""
    if not spark.catalog.tableExists(table):
        spark.catalog.createTable(table, path=root, source="parquet")
        spark.catalog.recoverPartitions(table)
    return spark.table(table)


def consume_topic_partitions(
    spark: SparkSession, table: str, topic: str, partitions: list[int]
) -> DataFrame:
    """Offset-range consume's catalog half: restrict to one topic and an
    explicit partition set — Catalyst turns both predicates into
    PartitionFilters (pruned at planning, zero data files from other
    topics/partitions are opened)."""
    return spark.table(table).filter(
        (F.col("topic") == topic) & F.col("partition").isin(partitions)
    )


__all__ = [
    "register_topic",
    "topic_exists",
    "get_topic",
    "list_topics",
    "drop_topic",
    "publish_partitioned",
    "register_persistent_topic",
    "consume_topic_partitions",
    "AnalysisException",
]
