"""Property test: asof_join must agree with pandas merge_asof on random
probe/state tables (the trickiest composed operator in the engine)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st


_keys = st.integers(min_value=0, max_value=5)
_times = st.integers(min_value=0, max_value=1_000)


@settings(max_examples=15, deadline=None)
@given(
    probes=st.lists(st.tuples(_keys, _times), min_size=1, max_size=40),
    states=st.lists(st.tuples(_keys, _times, st.integers(0, 1000)), min_size=1, max_size=40),
)
def test_asof_join_matches_merge_asof(spark, probes, states):
    from pyspark.sql import functions as F

    from cascade_spark.operators.asof import asof_join

    probe_pd = pd.DataFrame(probes, columns=["k", "pt"]).drop_duplicates()
    probe_pd["pid"] = range(len(probe_pd))
    state_pd = (
        pd.DataFrame(states, columns=["k", "st", "v"])
        .groupby(["k", "st"], as_index=False)
        .agg(v=("v", "max"))  # unique per (key, ts) — asof_join's contract
    )

    probe = spark.createDataFrame(probe_pd, "k long, pt long, pid long")
    state = spark.createDataFrame(state_pd, "k long, st long, v long")
    got = {
        r["pid"]: r["v"]
        for r in asof_join(
            probe, state, probe_on="k", state_on="k", probe_ts="pt", state_ts="st",
            value_cols=["v"],
        ).collect()
    }

    want_df = pd.merge_asof(
        probe_pd.sort_values(["pt", "pid"]),
        state_pd.sort_values("st"),
        left_on="pt",
        right_on="st",
        by="k",
        direction="backward",  # greatest st <= pt — inclusive, like ours
    )
    want = {
        int(r.pid): (None if pd.isna(r.v) else int(r.v)) for r in want_df.itertuples()
    }
    assert got == want
