"""Deduplication operators — the LLM-data-pipeline north-star surface.

Four flavors over ``documents`` (exact → fuzzy), all *deterministic* so
the DuckDB oracle can hash-check them (no MLlib random hash families —
hash functions are md5-derived and identical in both engines; cross-
engine parity of ``conv(hex,16,10)`` vs ``('0x'||hex)::BIGINT`` verified).

Scale design (100 TB corpora):
- exact: one hash-groupBy, fully map-side combinable.
- n-gram Jaccard: shingle inverted index self-join. The candidate
  explosion is bounded by dropping ultra-common shingles (document
  frequency cap — standard practice; the cap is a declared constant so
  the oracle applies the same rule).
- MinHash+LSH: fixed 16-hash signature, 4 bands × 4 rows; candidates
  only materialize on band-hash equality, estimated Jaccard from
  signature agreement. This is the scale path: cost is linear in corpus
  size + band-bucket collisions, never O(n²).
- SimHash: 48-bit fingerprint; near-dup candidates via 4×12-bit band
  equality, verified by Hamming distance ≤ threshold (bit_count(xor)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cascade_spark.plans.registry import register
from cascade_spark.operators._util import t

N_HASHES = 16
BANDS = 4  # rows per band = N_HASHES // BANDS = 4
SHINGLE_DF_CAP = 100  # drop shingles appearing in more docs than this
SIMHASH_BITS = 48
SIMHASH_BAND_BITS = 12
HAMMING_MAX = 6


def _shingles(docs: DataFrame) -> DataFrame:
    """Distinct word 3-gram shingles per doc (empty for docs < 3 words)."""
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(words, i), F.element_at(words, i + 1), F.element_at(words, i + 2)
        ),
    )
    return docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.when(n >= 3, grams).otherwise(F.array()))).alias("s"),
    )


_SQL_SHINGLES = """
    SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
         LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - 2)) AS i)
"""


@register(
    "dedup_exact",
    "dedup",
    doc="Exact dedup: md5 content fingerprint over normalized text, "
    "hash-groupBy (map-side combinable — the cheapest pass over 100 TB).",
    oracle="""
WITH fp AS (
    SELECT doc_id,
           MD5(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g')))) AS fingerprint
    FROM documents
)
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT fingerprint) AS n_unique,
       COUNT(*) - COUNT(DISTINCT fingerprint) AS n_dupes,
       MIN(fingerprint) AS min_fp
FROM fp
""",
)
def dedup_exact(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))).alias("fingerprint"),
    )
    return fp.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fingerprint").alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct("fingerprint")).alias("n_dupes"),
        F.min("fingerprint").alias("min_fp"),
    )


@register(
    "dedup_ngram_jaccard",
    "dedup",
    doc="n-gram Jaccard near-dup pairs via shingle inverted-index "
    "self-join; DF-capped shingles bound the candidate set; the "
    "threshold test (|∩|·5 ≥ |∪|, i.e. J ≥ 0.2) is exact integer "
    "arithmetic on both engines.",
    oracle=f"""
WITH sh AS ({_SQL_SHINGLES}),
common AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) > {SHINGLE_DF_CAP}),
sh2 AS (SELECT * FROM sh WHERE s NOT IN (SELECT s FROM common)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id),
pairs AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
    FROM sh2 a JOIN sh2 b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT p.d1, p.d2, p.inter,
       (sa.n + sb.n - p.inter) AS uni,
       ROUND(CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter), 4) AS jaccard
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.d1
JOIN sizes sb ON sb.doc_id = p.d2
WHERE p.inter * 5 >= (sa.n + sb.n - p.inter)
ORDER BY p.d1, p.d2
""",
)
def dedup_ngram_jaccard(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    sh = _shingles(d)
    common = sh.groupBy("s").count().filter(F.col("count") > SHINGLE_DF_CAP).select("s")
    sh2 = sh.join(common, "s", "left_anti")
    sizes = sh2.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh2.alias("a"), sh2.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("nb"))
    uni = F.col("na") + F.col("nb") - F.col("inter")
    return (
        pairs.join(sa, "d1")
        .join(sb, "d2")
        .filter(F.col("inter") * 5 >= uni)
        .select(
            "d1",
            "d2",
            "inter",
            uni.alias("uni"),
            F.round(F.col("inter").cast("double") / uni, 4).alias("jaccard"),
        )
        .orderBy("d1", "d2")
    )


def _minhash(spark, sf_dir) -> DataFrame:
    """(doc_id, seed, h): md5-derived minhash signature rows."""
    d = t(spark, sf_dir, "documents")
    sh = _shingles(d)
    seeds = spark.range(N_HASHES).select(F.col("id").cast("int").alias("seed"))
    return (
        sh.crossJoin(F.broadcast(seeds))
        .select(
            "doc_id",
            "seed",
            F.conv(F.substring(F.md5(F.concat_ws(":", "seed", "s")), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("h"))
    )


_SQL_MINHASH = f"""
    SELECT doc_id, seed,
           MIN(('0x' || SUBSTR(MD5(seed || ':' || s), 1, 15))::BIGINT) AS h
    FROM ({_SQL_SHINGLES}) CROSS JOIN
         (SELECT UNNEST(GENERATE_SERIES(0, {N_HASHES - 1})) AS seed)
    GROUP BY doc_id, seed
"""


@register(
    "dedup_minhash_lsh",
    "dedup",
    doc="MinHash+LSH near-dup: 16 md5-derived min-hashes, 4 bands × 4 "
    "rows; candidate pairs share a band hash; estimated Jaccard = "
    "signature agreement / 16, kept at ≥ 0.5. Deterministic → fully "
    "oracle-checked (unlike MLlib's randomized MinHashLSH).",
    oracle=f"""
WITH mh AS ({_SQL_MINHASH}),
bands AS (
    SELECT doc_id, seed // {N_HASHES // BANDS} AS band,
           MD5(STRING_AGG(CAST(h AS VARCHAR), ',' ORDER BY seed)) AS bh
    FROM mh GROUP BY doc_id, seed // {N_HASHES // BANDS}
),
cand AS (
    SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
sim AS (
    SELECT c.d1, c.d2,
           SUM(CASE WHEN x.h = y.h THEN 1 ELSE 0 END) AS matches
    FROM cand c
    JOIN mh x ON x.doc_id = c.d1
    JOIN mh y ON y.doc_id = c.d2 AND y.seed = x.seed
    GROUP BY c.d1, c.d2
)
SELECT d1, d2, CAST(matches AS BIGINT) AS matches,
       CAST(matches AS DOUBLE) / {N_HASHES} AS est_jaccard
FROM sim WHERE matches * 2 >= {N_HASHES}
ORDER BY d1, d2
""",
)
def dedup_minhash_lsh(spark, sf_dir):
    mh = _minhash(spark, sf_dir)
    rows_per_band = N_HASHES // BANDS
    bands = (
        mh.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "h"))), lambda x: x["h"]
                    ),
                    ",",
                )
            ).alias("bh")
        )
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    x = mh.select(F.col("doc_id").alias("d1"), "seed", F.col("h").alias("hx"))
    y = mh.select(F.col("doc_id").alias("d2"), "seed", F.col("h").alias("hy"))
    sim = (
        cand.join(x, "d1")
        .join(y, ["d2", "seed"])
        .groupBy("d1", "d2")
        .agg(F.sum(F.when(F.col("hx") == F.col("hy"), 1).otherwise(0)).alias("matches"))
    )
    return (
        sim.filter(F.col("matches") * 2 >= N_HASHES)
        .select(
            "d1",
            "d2",
            F.col("matches").cast("long").alias("matches"),
            (F.col("matches").cast("double") / N_HASHES).alias("est_jaccard"),
        )
        .orderBy("d1", "d2")
    )


@register(
    "dedup_simhash",
    "dedup",
    doc="48-bit SimHash fingerprints (md5-derived word hashes, "
    "frequency-weighted bit votes) + near-dup pairs via 4×12-bit band "
    "candidates and Hamming ≤ 6 verification (bit_count(xor)).",
    oracle=f"""
WITH wh AS (
    SELECT doc_id, ('0x' || SUBSTR(MD5(w), 1, {SIMHASH_BITS // 4}))::BIGINT AS h
    FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents)
    WHERE w <> ''
),
votes AS (
    SELECT doc_id, j,
           SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
    FROM wh CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, {SIMHASH_BITS - 1})) AS j)
    GROUP BY doc_id, j
),
sig AS (
    SELECT doc_id,
           SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS simhash
    FROM votes GROUP BY doc_id
),
banded AS (
    SELECT doc_id, simhash, k,
           (simhash >> (k * {SIMHASH_BAND_BITS})) & {(1 << SIMHASH_BAND_BITS) - 1} AS chunk
    FROM sig CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, {BANDS - 1})) AS k)
),
cand AS (
    SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
           a.simhash AS s1, b.simhash AS s2
    FROM banded a JOIN banded b
      ON a.k = b.k AND a.chunk = b.chunk AND a.doc_id < b.doc_id
)
SELECT d1, d2, CAST(BIT_COUNT(XOR(s1, s2)) AS BIGINT) AS hamming
FROM cand
WHERE BIT_COUNT(XOR(s1, s2)) <= {HAMMING_MAX}
ORDER BY d1, d2
""",
)
def dedup_simhash(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    wh = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("w"), 1, SIMHASH_BITS // 4), 16, 10).cast("long").alias("h"),
        )
    )
    bits = wh.sparkSession.range(SIMHASH_BITS).select(F.col("id").cast("int").alias("j"))
    # shift amounts are columns → F.expr (pyspark's shiftleft/shiftright
    # helpers only accept int literals)
    votes = (
        wh.crossJoin(F.broadcast(bits))
        .groupBy("doc_id", "j")
        .agg(
            F.sum(F.when(F.expr("(h >> j) & 1") == 1, 1).otherwise(-1)).alias("v")
        )
    )
    sig = votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0)
        ).alias("simhash")
    )
    mask = (1 << SIMHASH_BAND_BITS) - 1
    ks = sig.sparkSession.range(BANDS).select(F.col("id").cast("int").alias("k"))
    banded = sig.crossJoin(F.broadcast(ks)).select(
        "doc_id",
        "simhash",
        "k",
        F.expr(f"(simhash >> (k * {SIMHASH_BAND_BITS})) & {mask}").alias("chunk"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.simhash").alias("s1"),
            F.col("b.simhash").alias("s2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
    return (
        cand.filter(hamming <= HAMMING_MAX)
        .select("d1", "d2", hamming.cast("long").alias("hamming"))
        .orderBy("d1", "d2")
    )
