"""Set operations (SURVEY.md §2B Set operations)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cascade_spark.plans.registry import register
from cascade_spark.operators._util import t


def _actors(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    c = t(spark, sf_dir, "customer")
    return ev.select(F.col("user_id").alias("uid")), c.select(F.col("c_custkey").alias("uid"))


@register(
    "setop_union",
    "setops",
    doc="UNION ALL + UNION (distinct) counts over event actors vs customer "
    "keys.",
    oracle="""
SELECT
  (SELECT COUNT(*) FROM (SELECT user_id AS uid FROM events
                         UNION ALL SELECT c_custkey FROM customer)) AS n_union_all,
  (SELECT COUNT(*) FROM (SELECT user_id AS uid FROM events
                         UNION SELECT c_custkey FROM customer)) AS n_union_distinct
""",
)
def setop_union(spark, sf_dir):
    e, c = _actors(spark, sf_dir)
    n_all = e.unionAll(c).agg(F.count(F.lit(1)).alias("n_union_all"))
    n_dist = e.union(c).distinct().agg(F.count(F.lit(1)).alias("n_union_distinct"))
    return n_all.crossJoin(n_dist)


@register(
    "setop_intersect",
    "setops",
    doc="INTERSECT: actors that are also customers.",
    oracle="""
SELECT user_id AS uid FROM events
INTERSECT
SELECT c_custkey FROM customer
ORDER BY uid
""",
)
def setop_intersect(spark, sf_dir):
    e, c = _actors(spark, sf_dir)
    return e.intersect(c).orderBy("uid")


@register(
    "setop_except",
    "setops",
    doc="EXCEPT (distinct): customer keys with no events.",
    oracle="""
SELECT c_custkey AS uid FROM customer
EXCEPT
SELECT user_id FROM events
ORDER BY uid
""",
)
def setop_except(spark, sf_dir):
    e, c = _actors(spark, sf_dir)
    return c.exceptAll(e).distinct().orderBy("uid")


@register(
    "setop_dedup_keep_first",
    "setops",
    doc="Deterministic dropDuplicates: keep the lowest doc_id per "
    "(lang, source) — dropDuplicates itself keeps an arbitrary row, so "
    "the deterministic form is the row_number composition (SURVEY §2B "
    "dedup north-star, exact flavor).",
    oracle="""
SELECT lang, source, doc_id
FROM (
    SELECT lang, source, doc_id,
           ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
    FROM documents
)
WHERE rn = 1
ORDER BY lang, source
""",
)
def setop_dedup_keep_first(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang", "source", "doc_id")
        .orderBy("lang", "source")
    )
