"""Property-based tests (hypothesis) for the determinism-critical
primitives: exact rounded averages, distributed offset assignment,
minhash permutation parity."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings, strategies as st

from cascade_spark.operators._util import sql_avg_round

# scale-4 decimal sums as integers (sum*10^4), realistic magnitudes
_SUMS = st.integers(min_value=0, max_value=10**13)
_COUNTS = st.integers(min_value=1, max_value=10**6)


@settings(max_examples=200, deadline=None)
@given(s=_SUMS, c=_COUNTS, k=st.sampled_from([2, 4]))
def test_sql_avg_round_is_half_up_decimal_rounding(s, c, k):
    """The integer-arithmetic rounded average must equal Python's exact
    Decimal half-up rounding of sum/count for every input."""
    con = duckdb.connect()
    dec_literal = f"CAST('{Decimal(s).scaleb(-4)}' AS DECIMAL(18,4))"
    expr = sql_avg_round(dec_literal, k, count_expr=str(c))
    got = con.sql(f"SELECT {expr} AS v").fetchall()[0][0]
    want = float(
        (Decimal(s) / Decimal(10**4) / Decimal(c)).quantize(
            Decimal(1).scaleb(-k), rounding=ROUND_HALF_UP
        )
    )
    assert got == want, (s, c, k, got, want)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=300),
    parts=st.integers(min_value=1, max_value=8),
)
def test_assign_offsets_dense_and_order_preserving(spark, n, parts):
    """Offsets are a dense 0..n-1 permutation following the total order,
    for any row count and partition count."""
    from pyspark.sql import functions as F

    from cascade_spark.operators.ingest import assign_offsets

    df = spark.range(n).select(
        (F.col("id") * 7919 % 104729).alias("key"), F.col("id").alias("uid")
    )
    out = assign_offsets(df, ["key", "uid"], num_partitions=parts).collect()
    assert len(out) == n
    by_offset = sorted(out, key=lambda r: r["offset"])
    assert [r["offset"] for r in by_offset] == list(range(n))
    assert by_offset == sorted(out, key=lambda r: (r["key"], r["uid"]))


def test_minhash_permutation_parity_spark_duckdb(spark):
    """The affine permutation family produces identical values in Spark
    and DuckDB over a range of base hashes."""
    import duckdb

    from pyspark.sql import functions as F

    from cascade_spark.operators.dedup import MH_A, MH_B, MH_P

    base = list(range(0, 2**30, 2**30 // 97))
    sdf = spark.createDataFrame([(h,) for h in base], "h0 long")
    scols = [
        F.expr(f"({MH_A[k]} * h0 + {MH_B[k]}) % {MH_P}").alias(f"h{k}") for k in range(4)
    ]
    srows = sorted(tuple(r) for r in sdf.select(*scols).collect())
    con = duckdb.connect()
    con.sql("CREATE TABLE t(h0 BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(h,) for h in base])
    drows = sorted(
        tuple(r)
        for r in con.sql(
            "SELECT "
            + ", ".join(f"({MH_A[k]} * h0 + {MH_B[k]}) % {MH_P}" for k in range(4))
            + " FROM t"
        ).fetchall()
    )
    assert srows == drows


# -- word n-gram extraction parity (span dedup / bigram LM primitives) --

_WORDS = st.lists(
    st.text(alphabet="abcxyz", min_size=1, max_size=4), min_size=0, max_size=20
)


def _py_ngrams(words: list[str], n: int) -> list[str]:
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


@settings(max_examples=20, deadline=None)
@given(docs=st.lists(_WORDS, min_size=1, max_size=5), n=st.sampled_from([2, 3, 8]))
def test_word_ngrams_match_python_reference(spark, docs, n):
    """_word_ngrams (posexplode + window leads) must produce exactly the
    sliding word n-grams a direct Python implementation yields, for any
    word sequence — including docs shorter than n (empty) and repeated
    words (kept when distinct=False)."""
    from cascade_spark.operators.substring_dedup import _word_ngrams

    rows = [(i, " ".join(w)) for i, w in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["s"])
        for r in _word_ngrams(df, n, distinct=False).collect()
    )
    want = sorted(
        (i, g)
        # split(text,' ') on an empty string yields [''] in both engines;
        # mirror that in the reference
        for i, w in enumerate((" ".join(d)).split(" ") for d in docs)
        for g in _py_ngrams(w, n)
    )
    assert got == want
