"""Round-8 operator tests — engine-side invariants the DuckDB oracle
cannot see (decoder environment-independence, CC convergence flags,
JDBC partition-boundary arithmetic, LSH-blocked semantic dedup)."""

from __future__ import annotations

import sys
import types

import pytest

from cascade_spark.plans.registry import load_all


def test_decode_stub_ignores_installed_pil(monkeypatch):
    """decode_image_stub must return the deterministic oracle-matched
    fake even in a container WHERE Pillow IS importable — the round-7
    verdict found the probe inverted (raised when PIL import
    succeeded)."""
    from cascade_spark.operators import multimodal

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = types.ModuleType("PIL.Image")
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_pil.Image)

    blob = b"round-8 pil inversion probe"
    w, h, nf, status = multimodal.decode_image_stub(blob)
    import hashlib

    md5 = hashlib.md5(blob).hexdigest()
    assert w == int(md5[0:4], 16) % 1920
    assert h == int(md5[4:8], 16) % 1080
    assert nf == int(md5[8:10], 16) % 16 + 1
    assert status == "fake-decoded"


def test_multimodal_decode_green_with_fake_pil(spark, sf_dir, monkeypatch):
    """End-to-end: the registered query stays green with a fake PIL
    visible to the driver (executors run the stub, which no longer
    probes for PIL at all)."""
    fake_pil = types.ModuleType("PIL")
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    rows = load_all()["multimodal_decode"].builder(spark, sf_dir).limit(5).collect()
    assert rows and all(r["status"] == "fake-decoded" for r in rows)


def _path_graph(spark, n):
    """Undirected path 0-1-2-...-n-1 as the (src, nbr) edge frame +
    identity labels, the shape _cc_labels_distributed consumes."""
    from pyspark.sql import functions as F

    pairs = spark.range(n - 1).select(
        F.col("id").alias("d1"), (F.col("id") + 1).alias("d2")
    )
    fwd = pairs.select(F.col("d1").alias("src"), F.col("d2").alias("nbr"))
    rev = pairs.select(F.col("d2").alias("src"), F.col("d1").alias("nbr"))
    edges = fwd.union(rev)
    labels = (
        edges.select("src").distinct()
        .select(F.col("src").alias("node"))
        .withColumn("comp", F.col("node"))
    )
    return edges, labels


def test_cc_distributed_raises_past_iteration_cap(spark):
    """A path graph with diameter > cap must RAISE, not silently return
    unconverged (wrong) labels — the round-7 verdict's silent-cap item.
    Exercises the distributed min-label branch directly."""
    from cascade_spark.operators.dedup import _cc_labels_distributed

    edges, labels = _path_graph(spark, 10)  # diameter 9 > cap 4
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc_labels_distributed(edges, labels, max_iters=4)


def test_cc_distributed_converges_and_matches_local(spark):
    """Distributed min-label propagation on a >cap-safe path graph
    agrees with the driver-side union-find on every node label."""
    from cascade_spark.operators.dedup import _cc_local, _cc_labels_distributed

    n = 9
    edges, labels = _path_graph(spark, n)
    got = {
        r["node"]: r["comp"]
        for r in _cc_labels_distributed(edges, labels, max_iters=n + 2).collect()
    }
    want = dict(_cc_local([(i, i + 1) for i in range(n - 1)]))
    assert got == want == {i: 0 for i in range(n)}
