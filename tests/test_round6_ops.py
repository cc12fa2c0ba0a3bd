"""Round-6 operator semantics — property tests beyond the oracle gate."""

from __future__ import annotations

import os

import pytest

from cascade_spark.plans.registry import load_all
from cascade_spark.plans.compare import compare
from cascade_spark.tables import load as tload


def _write_all_empty_except(spark, sf_dir, out_dir, overrides):
    """Fixture dir with every table empty except the supplied frames —
    compare() builds DuckDB views for all tables, so all must exist as
    SINGLE parquet files (the shape of the real testdata dirs)."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    con = duckdb.connect()
    for t in tables:
        if t in overrides:
            pdf = overrides[t].toPandas()  # noqa: F841 (duckdb scans it)
            con.sql(
                f"COPY (SELECT * FROM pdf) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            con.sql(
                f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet') LIMIT 0)"
                f" TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.close()


def test_struct_accumulator_empty_array_oracle_parity(spark, sf_dir, tmp_path):
    """ADVICE r5: SUM over an empty UNNEST is NULL in SQL, but the fold
    zero is 0 — q_sum must be NULL (not 0) for a zero-length embedding,
    alongside the already-NULL q_min/q_max and dim = 0."""
    from pyspark.sql import functions as F

    emb = tload(spark, sf_dir, "embeddings").limit(2)
    empty_row = emb.limit(1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.slice("embedding", 1, 0).alias("embedding"),
        "label",
    )
    d = str(tmp_path / "emptyvec")
    _write_all_empty_except(
        spark, sf_dir, d, {"embeddings": emb.unionByName(empty_row)}
    )
    q = load_all()["fn_aggregate_struct_accumulator"]
    out = q.builder(spark, d)
    ok, msg = compare(out, q.oracle, d)
    assert ok, msg
    row = {r["vec_id"]: r for r in out.collect()}[1_000_000]
    assert row["q_sum"] is None and row["q_min"] is None
    assert row["dim"] == 0


def test_vocab_coverage_uses_takeordered_not_global_sort(spark, sf_dir):
    """The top-k candidate frame must come from a TakeOrdered pushdown —
    a global Sort over the vocabulary would serialize on one task at
    corpus scale."""
    from pyspark.sql import functions as F
    from cascade_spark.tables import load as tload2

    d = tload2(spark, sf_dir, "documents")
    cnt = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = cnt.orderBy(F.desc("c"), "w").limit(100)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_late_audit_drop_set_nonempty_and_conserved(spark, sf_dir):
    """The audit must actually exercise the drop path (older half below
    the watermark) and conserve rows: n_batch = n_stream + dropped."""
    from pyspark.sql import functions as F

    from cascade_spark.plans.registry import load_all

    rows = (
        load_all()["stream_late_data_audit"]
        .builder(spark, sf_dir)
        .agg(
            F.sum("n_batch").alias("b"),
            F.sum("n_stream").alias("s"),
            F.sum("n_late_dropped").alias("d"),
        )
        .collect()[0]
    )
    assert rows["d"] > 0, "no late rows dropped — the audit is vacuous"
    assert rows["b"] == rows["s"] + rows["d"]


def test_rebalance_hint_reaches_optimized_plan(spark, sf_dir):
    """sink_rebalanced_write's REBALANCE hint must survive analysis into
    the optimized plan as RebalancePartitions — otherwise the write
    degenerates to the static partitioning it exists to avoid."""
    from cascade_spark.tables import load as tload3

    li = tload3(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    plan = li.hint("rebalance", "l_returnflag")._jdf.queryExecution().optimizedPlan().toString()
    assert "RebalancePartitions" in plan, plan


def test_xml_roundtrip_preserves_row_count(spark, sf_dir, tmp_path):
    """Native XML sink+source must preserve every row and key through
    the text encoding (scan_xml_roundtrip's aggregate would also catch
    this, but the direct row/key check localizes a failure)."""
    from pyspark.sql import functions as F
    from cascade_spark.tables import load as tload4

    o = tload4(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    out = str(tmp_path / "xml_orders")
    o.write.format("xml").option("rowTag", "order").save(out)
    back = spark.read.format("xml").option("rowTag", "order").schema(o.schema).load(out)
    assert back.count() == o.count()
    assert back.agg(F.sum("o_orderkey")).collect()[0][0] == o.agg(F.sum("o_orderkey")).collect()[0][0]


def test_spearman_negative_rho_truncation_parity(spark, sf_dir, tmp_path):
    """Perfectly anti-correlated users must give rho_bp = -10000, and a
    partially negative rho must agree between Spark's DIV and DuckDB's
    // (both truncate toward zero — the documented contract)."""
    import pandas as pd

    # users 1..6: more clicks -> strictly less purchase spend
    rows, eid = [], 0
    for uid in range(1, 7):
        for _ in range(uid):  # uid clicks
            rows.append((eid, "2024-01-01 00:00:00", uid, "click", 0.0, "{}")); eid += 1
        rows.append((eid, "2024-01-01 01:00:00", uid, "purchase",
                     float(70 - 10 * uid), "{}")); eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type",
                                      "value", "props"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    d = str(tmp_path / "anticorr")
    _write_all_empty_except(spark, sf_dir, d, {"events": spark.createDataFrame(pdf)})
    q = load_all()["stats_spearman_rho"]
    out = q.builder(spark, d)
    ok, msg = compare(out, q.oracle, d)
    assert ok, msg
    assert out.collect()[0]["rho_bp"] == -10000
