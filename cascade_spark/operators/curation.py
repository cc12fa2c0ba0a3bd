"""Corpus curation pipeline — the operators composed end-to-end.

What an LLM-data user actually runs: exact-dedup (keep first) → quality
gate → language ID → per-(lang, source) corpus stats. One declarative
plan: Catalyst fuses the per-doc feature projections into a single pass
over the corpus; the only shuffles are the dedup window and the final
small aggregate. At 100 TB this whole pipeline is ~2 shuffles.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from cascade_spark.plans.registry import register
from cascade_spark.operators._util import sql_avg_round, t, widen
from cascade_spark.operators.text import LANG_MARKERS, _sql_hits

_QUALITY_SQL = """
    LENGTH(REGEXP_REPLACE(text, '[^a-z]', '', 'g')) * 10 >= LENGTH(text) * 7
    AND LEN(STRING_SPLIT(text, ' ')) >= 10
"""


@register(
    "pipeline_corpus_curation",
    "analytics",
    doc="Composed pipeline: exact-dedup keep-first (md5 fingerprint + "
    "row_number) → quality gate (alpha ratio ≥ 0.7, ≥ 10 words) → "
    "marker-lexicon language ID → per-(pred_lang, source) stats. "
    "Single-pass feature projection, two shuffles total.",
    oracle=f"""
WITH fp AS (
    SELECT doc_id, text, source,
           MD5(LOWER(TRIM(text))) AS fingerprint
    FROM documents
),
deduped AS (
    SELECT doc_id, text, source
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn FROM fp)
    WHERE rn = 1
),
quality AS (
    SELECT * FROM deduped WHERE {_QUALITY_SQL}
),
tagged AS (
    SELECT doc_id, source,
           LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
           CASE
             WHEN {_sql_hits('en')} >= {_sql_hits('de')} AND {_sql_hits('en')} > 0 THEN 'en'
             WHEN {_sql_hits('de')} > 0 THEN 'de'
             ELSE 'unknown'
           END AS pred_lang
    FROM quality
)
SELECT pred_lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       {sql_avg_round("SUM(CAST(n_tokens AS DECIMAL(12,4)))", 2)} AS avg_tokens
FROM tagged
GROUP BY pred_lang, source
ORDER BY pred_lang, source
""",
)
def pipeline_corpus_curation(spark, sf_dir):
    from cascade_spark.operators._util import avg_round, dec

    d = widen(t(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), " ")
    fp = d.select(
        "doc_id", "text", "source", F.md5(F.lower(F.trim("text"))).alias("fingerprint")
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    deduped = fp.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    quality = deduped.filter(
        (F.length(F.regexp_replace("text", "[^a-z]", "")) * 10 >= F.length("text") * 7)
        & (F.size(words) >= 10)
    )

    def hits(lang):
        arr = F.array([F.lit(x) for x in LANG_MARKERS[lang]])
        return F.size(F.filter(words, lambda x: F.array_contains(arr, x)))

    tagged = quality.select(
        "doc_id",
        "source",
        F.size(words).alias("n_tokens"),
        F.when((hits("en") >= hits("de")) & (hits("en") > 0), "en")
        .when(hits("de") > 0, "de")
        .otherwise("unknown")
        .alias("pred_lang"),
    )
    return (
        tagged.groupBy("pred_lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            avg_round(F.sum(dec("n_tokens")), F.count(F.lit(1)), 2).alias("avg_tokens"),
        )
        .orderBy("pred_lang", "source")
    )
