"""Round-9 wave-5 — SQL-surface and pipeline-diagnostic additions:

- ``sql_values_inline_table``: the VALUES inline-table clause as a
  first-class FROM source (config/lookup tables embedded in a query —
  tiering regions without a physical table), LEFT-joined so unmatched
  rows keep a declared default.
- ``sql_lateral_view_outer``: the HiveQL ``LATERAL VIEW OUTER``
  clause — row-multiplying explode that PRESERVES rows whose array is
  empty (the outer semantics observable as NULL-word rows); the oracle
  mirrors it with a LEFT JOIN UNNEST.
- ``pipeline_tokenizer_compare``: whitespace vs BPE-ish-regex
  tokenizer fertility per source — the mixture-level readout of
  text_token_count's per-doc counts (ratio in exact floor bp), the
  number you check before swapping tokenizers on a source.

Reference scope: the reference engine is an event log
(src/broker/main.rs); these are declared queries over the consumed
``documents``/dimension tables per SURVEY §2B.

Scale (100 TB): the VALUES table is literal (broadcast by construction)
and the lateral explode is the one corpus pass with a combinable
rollup behind it; tokenizer-compare is one map-only scoring pass into a
per-source groupBy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cascade_spark.operators._util import bigint, t
from cascade_spark.plans.registry import register


@register(
    "sql_values_inline_table",
    "sql",
    doc="VALUES as an inline FROM table: a literal region->tier lookup "
    "joined to region+nation with a COALESCE default for unlisted "
    "regions — the embedded-config-table surface (Spark and DuckDB "
    "share the VALUES ... AS t(cols) syntax). Literal tables are "
    "broadcast by construction at any scale.",
    oracle="""
SELECT n.n_name, r.r_name, COALESCE(p.tier, 9) AS tier
FROM nation n
JOIN region r ON r.r_regionkey = n.n_regionkey
LEFT JOIN (VALUES ('ASIA', 1), ('EUROPE', 1), ('AMERICA', 2))
     AS p(r_name, tier) ON p.r_name = r.r_name
ORDER BY n.n_name
""",
)
def sql_values_inline_table(spark, sf_dir):
    t(spark, sf_dir, "nation").createOrReplaceTempView("cascade_vals_nation")
    t(spark, sf_dir, "region").createOrReplaceTempView("cascade_vals_region")
    return spark.sql(
        """
        SELECT n.n_name, r.r_name, COALESCE(p.tier, 9) AS tier
        FROM cascade_vals_nation n
        JOIN cascade_vals_region r ON r.r_regionkey = n.n_regionkey
        LEFT JOIN (VALUES ('ASIA', 1), ('EUROPE', 1), ('AMERICA', 2))
             AS p(r_name, tier) ON p.r_name = r.r_name
        ORDER BY n.n_name
        """
    )


@register(
    "sql_lateral_view_outer",
    "sql",
    doc="LATERAL VIEW OUTER explode in SQL (the HiveQL clause next to "
    "the DataFrame fn_posexplode_outer): each doc explodes into its "
    "z-prefixed words, and docs with NO such word survive as one "
    "NULL-word row — the outer semantics made observable by counting "
    "them per source. Oracle mirrors with LEFT JOIN UNNEST.",
    oracle="""
WITH zw AS (
    SELECT doc_id,
           UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '), w -> w LIKE 'z%')) AS w
    FROM documents
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE zw.w IS NULL) AS BIGINT) AS n_docs_no_match,
       CAST(COUNT(zw.w) AS BIGINT) AS n_z_words
FROM documents d LEFT JOIN zw ON zw.doc_id = d.doc_id
GROUP BY d.source
ORDER BY d.source
""",
)
def sql_lateral_view_outer(spark, sf_dir):
    t(spark, sf_dir, "documents").createOrReplaceTempView("cascade_lvo_docs")
    return spark.sql(
        """
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(CASE WHEN w IS NULL THEN 1 END) AS BIGINT)
                   AS n_docs_no_match,
               CAST(COUNT(w) AS BIGINT) AS n_z_words
        FROM cascade_lvo_docs d
        LATERAL VIEW OUTER explode(
            filter(split(text, ' '), w -> w LIKE 'z%')) z AS w
        GROUP BY d.source
        ORDER BY d.source
        """
    )


@register(
    "pipeline_tokenizer_compare",
    "pipeline",
    doc="Tokenizer A/B at the mixture level: whitespace vs BPE-ish "
    "regex ([a-z0-9]+ runs plus single non-space symbols — the "
    "text_token_count pair) aggregated per source, with the fertility "
    "ratio re/ws in exact floor bp — the swap-decision readout before "
    "retokenizing a source at corpus scale. One map-only scoring pass, "
    "one combinable groupBy.",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LEN(STRING_SPLIT(TRIM(text), ' '))) AS BIGINT) AS ws_tokens,
       CAST(SUM(LEN(REGEXP_EXTRACT_ALL(text, '[a-z0-9]+|[^a-z0-9\\s]')))
            AS BIGINT) AS re_tokens,
       CAST((SUM(LEN(REGEXP_EXTRACT_ALL(text, '[a-z0-9]+|[^a-z0-9\\s]')))
             * 10000)
            // SUM(LEN(STRING_SPLIT(TRIM(text), ' '))) AS BIGINT)
           AS fertility_bp
FROM documents
GROUP BY source
ORDER BY source
""",
)
def pipeline_tokenizer_compare(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    ws = F.size(F.split(F.trim(F.col("text")), " ", -1))
    re_tok = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), 0)
    )
    per_doc = d.select("source", ws.cast("long").alias("ws"), re_tok.cast("long").alias("re"))
    return (
        per_doc.groupBy("source")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_docs"),
            bigint(F.sum("ws")).alias("ws_tokens"),
            bigint(F.sum("re")).alias("re_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "ws_tokens",
            "re_tokens",
            F.expr("CAST((re_tokens * 10000) DIV ws_tokens AS BIGINT)").alias(
                "fertility_bp"
            ),
        )
        .orderBy("source")
    )
