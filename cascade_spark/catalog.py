"""Topic catalog — the coordinator's registry, Spark-native.

Reference semantics (SURVEY.md §2A R8-R10): the coordinator keeps an
in-memory topic → brokers map (src/coordinator/brokermap.rs:5) with
register / lookup / remove RPCs (src/coordinator/main.rs:36-82). Spark's
catalog replaces all of it: a topic is a registered table over its
parquet directory; lookup of an unknown topic raises AnalysisException —
matching the coordinator's panic-on-unknown-topic
(src/coordinator/brokermap.rs:50).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


__all__ = [
    "register_topic",
    "topic_exists",
    "get_topic",
    "list_topics",
    "drop_topic",
    "AnalysisException",
]
