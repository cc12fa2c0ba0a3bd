"""Iterative graph analytics — PageRank over a derived bipartite graph.

The missing piece between one-shot relational queries and the
connected-components clustering in ``dedup.py``: a fixed-point iterative
algorithm expressed as repeated join+aggregate rounds over DataFrames,
the shape GraphFrames/Pregel use underneath. Ranks live in a DataFrame
(never on the driver); each iteration is one shuffle on the edge
destination key.

Determinism: ranks are kept as exact BIGINT "nano-rank" units
(total mass 1e9) and every division is integer floor division, so the
result is bit-identical across engines and partition orders — no float
tolerance, hash-checkable against a DuckDB oracle with the iterations
unrolled as CTEs.

Scale design (100 TB): the edge list with pre-joined out-weights is the
big frame — persist it once (done here); it is hash-partitioned on
``src`` and each iteration reuses that layout for the rank join, then
shuffles contributions on ``dst``. Rank frames are |V|-sized. In a long
power iteration the rank lineage is checkpointed every few rounds; with
3 fixed rounds lineage stays shallow enough that persistence of the
edge frame alone suffices.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cascade_spark.plans.registry import register
from cascade_spark.operators._util import _intdiv, t

_TOTAL = 1_000_000_000  # total rank mass, in nano-rank units
_EDGE_CACHE: dict = {}
_DAMP_NUM, _DAMP_DEN = 85, 100  # damping 0.85 as an exact rational
_ITERS = 3

# reused by tests
def _pagerank_frames(spark, sf_dir):
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    u = F.concat(F.lit("u:"), F.col("user_id").cast("string"))
    tt = F.concat(F.lit("t:"), F.col("event_type"))
    edges = ev.select(u.alias("src"), tt.alias("dst"), "w").unionByName(
        ev.select(tt.alias("src"), u.alias("dst"), "w")
    )
    outw = edges.groupBy("src").agg(F.sum("w").cast("long").alias("outw"))
    e = edges.join(outw, "src")
    nodes = edges.select(F.col("src").alias("node")).distinct()
    return e, nodes


@register(
    "graph_pagerank",
    "analytics",
    doc="Weighted PageRank (3 power iterations, damping 0.85) over the "
    "user<->event_type bipartite interaction graph derived from events. "
    "Exact integer arithmetic: rank mass is 1e9 nano-units, every "
    "division is floor division, so the fixed-iteration result is "
    "bit-identical to the unrolled-CTE DuckDB oracle. Each iteration = "
    "one join of the persisted out-weighted edge frame with the rank "
    "frame (hash-partitioned on src) + one aggregate on dst; ranks "
    "never touch the driver. Top-20 nodes by final rank.",
    oracle=f"""
WITH ev AS (
    SELECT 'u:' || CAST(user_id AS VARCHAR) AS u, 't:' || event_type AS tt,
           COUNT(*) AS w
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    GROUP BY user_id, event_type
),
edges AS (
    SELECT u AS src, tt AS dst, w FROM ev
    UNION ALL
    SELECT tt AS src, u AS dst, w FROM ev
),
outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw FROM edges GROUP BY src),
e AS (SELECT edges.src, edges.dst, edges.w, outw.outw
      FROM edges JOIN outw USING (src)),
nodes AS (SELECT DISTINCT src AS node FROM edges),
s AS (SELECT {_TOTAL} // COUNT(*) AS tpn,
             ({15} * ({_TOTAL} // COUNT(*))) // 100 AS base
      FROM nodes),
r0 AS (SELECT node, (SELECT tpn FROM s) AS pr FROM nodes),
i1 AS (SELECT e.dst, SUM((r.pr * e.w) // e.outw) AS inflow
       FROM e JOIN r0 r ON e.src = r.node GROUP BY e.dst),
r1 AS (SELECT n.node,
              (SELECT base FROM s)
              + ({_DAMP_NUM} * COALESCE(i.inflow, 0)) // {_DAMP_DEN} AS pr
       FROM nodes n LEFT JOIN i1 i ON n.node = i.dst),
i2 AS (SELECT e.dst, SUM((r.pr * e.w) // e.outw) AS inflow
       FROM e JOIN r1 r ON e.src = r.node GROUP BY e.dst),
r2 AS (SELECT n.node,
              (SELECT base FROM s)
              + ({_DAMP_NUM} * COALESCE(i.inflow, 0)) // {_DAMP_DEN} AS pr
       FROM nodes n LEFT JOIN i2 i ON n.node = i.dst),
i3 AS (SELECT e.dst, SUM((r.pr * e.w) // e.outw) AS inflow
       FROM e JOIN r2 r ON e.src = r.node GROUP BY e.dst),
r3 AS (SELECT n.node,
              (SELECT base FROM s)
              + ({_DAMP_NUM} * COALESCE(i.inflow, 0)) // {_DAMP_DEN} AS pr
       FROM nodes n LEFT JOIN i3 i ON n.node = i.dst)
SELECT node, CAST(pr AS BIGINT) AS pr
FROM r3
ORDER BY pr DESC, node
LIMIT 20
""",
)
def graph_pagerank(spark, sf_dir):
    from cascade_spark.operators.dedup import _cached_frame

    e, nodes = _pagerank_frames(spark, sf_dir)
    # keyed persist-cache (same eviction discipline as the dedup family:
    # repeat invocations reuse the edge frame instead of accumulating
    # persisted copies)
    e = _cached_frame(_EDGE_CACHE, spark, sf_dir, lambda: e)
    scal = F.broadcast(
        nodes.agg(
            _intdiv(F.lit(_TOTAL), F.count(F.lit(1))).alias("tpn"),
        ).select("tpn", _intdiv(F.lit(15) * F.col("tpn"), F.lit(100)).alias("base"))
    )
    r = nodes.crossJoin(scal).select("node", F.col("tpn").alias("pr"))
    for _ in range(_ITERS):
        contrib = e.join(r, e["src"] == r["node"]).select(
            "dst", _intdiv(F.col("pr") * F.col("w"), F.col("outw")).alias("c")
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").cast("long").alias("inflow"))
        r = (
            nodes.join(inflow, nodes["node"] == inflow["dst"], "left")
            .crossJoin(scal)
            .select(
                "node",
                (
                    F.col("base")
                    + _intdiv(
                        F.lit(_DAMP_NUM) * F.coalesce(F.col("inflow"), F.lit(0)),
                        F.lit(_DAMP_DEN),
                    )
                ).alias("pr"),
            )
        )
    return r.orderBy(F.col("pr").desc(), "node").limit(20)
