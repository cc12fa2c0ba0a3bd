"""SQL-surface features: LATERAL subqueries, IGNORE NULLS window
variants, boolean aggregates, URL parsing.

These are API-surface rows a user migrating real SQL workloads hits
immediately; each is the built-in (JVM/codegen) form, no Python.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from cascade_spark.plans.registry import register
from cascade_spark.operators._util import t


@register(
    "subquery_lateral_topn",
    "subqueries",
    doc="LATERAL correlated subquery (Spark SQL LATERAL, 3.4+): per "
    "nation, the top-2 customers by balance via a correlated ORDER BY "
    "... LIMIT subquery — the SQL-standard form of per-group top-k. "
    "Catalyst rewrites the lateral into the same rank-window shape as "
    "sort_topk_per_group, so the declared SQL surface and the "
    "DataFrame idiom share one physical plan family.",
    oracle="""
SELECT n.n_name, l.c_name, l.c_acctbal
FROM nation n,
     LATERAL (SELECT c_name, c_acctbal
              FROM customer c
              WHERE c.c_nationkey = n.n_nationkey
              ORDER BY c_acctbal DESC, c_name
              LIMIT 2) l
ORDER BY n.n_name, l.c_acctbal DESC, l.c_name
""",
)
def subquery_lateral_topn(spark, sf_dir):
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT n.n_name, l.c_name, l.c_acctbal
        FROM nation_v n,
             LATERAL (SELECT c_name, c_acctbal
                      FROM customer_v c
                      WHERE c.c_nationkey = n.n_nationkey
                      ORDER BY c_acctbal DESC, c_name
                      LIMIT 2) l
        ORDER BY n.n_name, l.c_acctbal DESC, l.c_name
        """
    )


@register(
    "window_ignore_nulls",
    "windows",
    doc="IGNORE NULLS window variants: values gapped to NULL on error "
    "events are carried forward with LAST_VALUE ... IGNORE NULLS and "
    "probed with NTH_VALUE ... IGNORE NULLS — the direct SQL form of "
    "the portable two-window forward-fill events_gapfill_interpolate "
    "uses. One shuffle on user_id serves both window functions.",
    oracle="""
WITH gapped AS (
    SELECT user_id, event_id, ts,
           CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
    FROM events
)
SELECT user_id, event_id,
       LAST_VALUE(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS carried,
       NTH_VALUE(v, 1 IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS first_valid
FROM gapped
ORDER BY user_id, event_id
""",
)
def window_ignore_nulls(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    gapped = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "error", None).otherwise(F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return gapped.select(
        "user_id",
        "event_id",
        F.last("v", ignorenulls=True).over(w).alias("carried"),
        F.nth_value("v", 1, ignoreNulls=True).over(w).alias("first_valid"),
    ).orderBy("user_id", "event_id")


@register(
    "agg_bool_flags",
    "aggregations",
    doc="Boolean aggregates (bool_and / bool_or / count_if) per event "
    "type — data-quality flags in one combinable pass.",
    oracle="""
SELECT event_type,
       BOOL_AND(value >= 0) AS all_nonneg,
       BOOL_OR(value > 99) AS any_large,
       CAST(COUNT(*) FILTER (WHERE value > 50) AS BIGINT) AS n_over_50,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def agg_bool_flags(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
            F.bool_or(F.col("value") > 99).alias("any_large"),
            F.count_if(F.col("value") > 50).cast("long").alias("n_over_50"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "fn_url_parse",
    "functions",
    doc="URL functions: documents get synthetic canonical URLs, then "
    "parse_url extracts host / path / query and a named query "
    "parameter — the log-pipeline normalization step, all JVM "
    "built-ins. The oracle reconstructs the expected components "
    "directly, so Spark's parser is checked against ground truth "
    "rather than a second parser.",
    oracle="""
SELECT doc_id,
       source || '.example.com' AS host,
       '/docs/' || CAST(doc_id AS VARCHAR) AS path,
       'lang=' || lang AS query,
       lang AS lang_param
FROM documents
ORDER BY doc_id
""",
)
def fn_url_parse(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    ).orderBy("doc_id")
