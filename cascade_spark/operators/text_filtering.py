"""Corpus filtering operators — the rule-based quality gates an LLM
training-data pipeline runs before dedup (Gopher/C4-style heuristics),
plus repetition detection and a corpus-level Zipf profile.

All pure built-ins. The per-doc filters are map-only (no shuffle — they
pipeline into whatever sink follows); the word-frequency ops shuffle on
(doc_id) / (word) with map-side partial counts, the same plan shape at
100 TB where the vocabulary aggregate is tiny next to the scan.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from cascade_spark.plans.registry import register
from cascade_spark.operators._util import bigint, t, widen
from cascade_spark.operators.text import STOPWORDS, _sql_array

MIN_WORDS, MAX_WORDS = 40, 10_000
MIN_MWL, MAX_MWL = 3.0, 10.0
MIN_DISTINCT = 0.35


@register(
    "text_gopher_quality_filter",
    "text",
    doc="Gopher-style rule filter: word-count bounds, mean-word-length "
    "bounds, stopword presence, distinct-word ratio — per-doc pass/fail "
    "with per-rule flags (map-only; no shuffle).",
    oracle=f"""
WITH feats AS (
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' ')) AS n_words,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
             / LEN(STRING_SPLIT(text, ' ')) AS mwl,
           LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                           w -> LIST_CONTAINS({_sql_array(STOPWORDS)}, w))) AS n_stop,
           CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
             / LEN(STRING_SPLIT(text, ' ')) AS distinct_ratio
    FROM documents
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       ROUND(mwl, 4) AS mean_word_len,
       CAST(CASE WHEN n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS} THEN 1 ELSE 0 END AS BIGINT) AS ok_length,
       CAST(CASE WHEN mwl BETWEEN {MIN_MWL} AND {MAX_MWL} THEN 1 ELSE 0 END AS BIGINT) AS ok_word_len,
       CAST(CASE WHEN n_stop > 0 THEN 1 ELSE 0 END AS BIGINT) AS ok_stopwords,
       CAST(CASE WHEN distinct_ratio >= {MIN_DISTINCT} THEN 1 ELSE 0 END AS BIGINT) AS ok_distinct,
       CAST(CASE WHEN n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
                  AND mwl BETWEEN {MIN_MWL} AND {MAX_MWL}
                  AND n_stop > 0 AND distinct_ratio >= {MIN_DISTINCT}
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM feats
ORDER BY doc_id
""",
)
def text_gopher_quality_filter(spark, sf_dir):
    d = widen(t(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), " ")
    stop_arr = F.array([F.lit(w) for w in STOPWORDS])
    n_words = F.size(words)
    mwl = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / n_words
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    distinct_ratio = F.size(F.array_distinct(words)).cast("double") / n_words
    feats = d.select(
        "doc_id",
        n_words.alias("n_words_i"),
        mwl.alias("mwl"),
        n_stop.alias("n_stop"),
        distinct_ratio.alias("dr"),
    )
    ok_length = F.col("n_words_i").between(MIN_WORDS, MAX_WORDS)
    ok_word_len = F.col("mwl").between(MIN_MWL, MAX_MWL)
    ok_stop = F.col("n_stop") > 0
    ok_distinct = F.col("dr") >= MIN_DISTINCT
    flag = lambda c: bigint(F.when(c, 1).otherwise(0))  # noqa: E731
    return feats.select(
        "doc_id",
        bigint(F.col("n_words_i")).alias("n_words"),
        F.round("mwl", 4).alias("mean_word_len"),
        flag(ok_length).alias("ok_length"),
        flag(ok_word_len).alias("ok_word_len"),
        flag(ok_stop).alias("ok_stopwords"),
        flag(ok_distinct).alias("ok_distinct"),
        flag(ok_length & ok_word_len & ok_stop & ok_distinct).alias("keep"),
    ).orderBy("doc_id")


@register(
    "text_top_word_ratio",
    "text",
    doc="Repetition detection: each doc's most frequent word and its "
    "frequency ratio (high ratio = degenerate/boilerplate text). "
    "Explode → per-(doc,word) count → argmax with lexicographic "
    "tie-break; both shuffles key on doc_id with map-side combine.",
    oracle="""
WITH words AS (
    SELECT doc_id, w
    FROM documents, UNNEST(STRING_SPLIT(text, ' ')) AS u(w)
),
cnt AS (
    SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
),
mx AS (
    SELECT doc_id, MAX(c) AS max_c, SUM(c) AS n_words
    FROM cnt GROUP BY doc_id
)
SELECT m.doc_id,
       MIN(c.w) AS top_word,
       CAST(m.max_c AS BIGINT) AS top_count,
       ROUND(CAST(m.max_c AS DOUBLE) / m.n_words, 4) AS top_ratio
FROM mx m JOIN cnt c ON c.doc_id = m.doc_id AND c.c = m.max_c
GROUP BY m.doc_id, m.max_c, m.n_words
ORDER BY m.doc_id
""",
)
def text_top_word_ratio(spark, sf_dir):
    d = widen(t(spark, sf_dir, "documents"))
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    cnt = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    mx = cnt.groupBy(F.col("doc_id").alias("m_doc_id")).agg(
        F.max("c").alias("max_c"), F.sum("c").alias("n_words")
    )
    return (
        mx.join(cnt, (F.col("m_doc_id") == F.col("doc_id")) & (F.col("c") == F.col("max_c")))
        .groupBy("doc_id", "max_c", "n_words")
        .agg(F.min("w").alias("top_word"))
        .select(
            "doc_id",
            "top_word",
            bigint(F.col("max_c")).alias("top_count"),
            F.round(F.col("max_c").cast("double") / F.col("n_words"), 4).alias("top_ratio"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_zipf_topwords",
    "text",
    doc="Corpus vocabulary profile: top-20 words by total frequency "
    "with dense rank (count desc, word asc tie-break). The vocabulary "
    "aggregate is tiny relative to the scan; top-k goes through "
    "TakeOrderedAndProject, not a global sort.",
    oracle="""
WITH words AS (
    SELECT w FROM documents, UNNEST(STRING_SPLIT(text, ' ')) AS u(w)
),
cnt AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w)
SELECT w AS word, CAST(c AS BIGINT) AS freq,
       CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS BIGINT) AS rank
FROM cnt
ORDER BY rank
LIMIT 20
""",
)
def text_zipf_topwords(spark, sf_dir):
    d = widen(t(spark, sf_dir, "documents"))
    cnt = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Top-k first (TakeOrderedAndProject over the tiny vocabulary agg),
    # then rank the 20 survivors — the single-partition window only ever
    # sees k rows, never the vocabulary.
    top = cnt.orderBy(F.desc("c"), "w").limit(20)
    w = Window.orderBy(F.desc("c"), "w")
    return top.select(
        F.col("w").alias("word"),
        bigint(F.col("c")).alias("freq"),
        bigint(F.row_number().over(w)).alias("rank"),
    ).orderBy("rank")
