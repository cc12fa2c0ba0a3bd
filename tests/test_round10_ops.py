"""Round-10 operator property tests — each nontrivial statistic is
recomputed independently (plain Python over the collected fixture
rows, O(n^2) where the operator is O(support)) and compared exactly,
so the merged-support / cumulative-grid reformulations are pinned
against the textbook pair-wise definitions."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pytest

from cascade_spark.plans.registry import load_all
from cascade_spark.tables import load


@pytest.fixture(scope="module")
def daily_by_dow(spark, sf_dir):
    """(iso_dow -> [daily total volume]) from the raw events table."""
    ev = load(spark, sf_dir, "events").collect()
    per_day = Counter()
    for r in ev:
        per_day[r["ts"].date()] += 1
    groups = defaultdict(list)
    for day, v in per_day.items():
        groups[day.isoweekday()].append(v)
    return groups


def test_jonckheere_terpstra_matches_direct_pair_sum(spark, sf_dir, daily_by_dow):
    """JT2 from the cumulative grid == doubled pairwise U-sum
    (2*#less + #ties over every cross-group pair, i < j)."""
    jt2 = 0
    gs = sorted(daily_by_dow)
    for ii, gi in enumerate(gs):
        for gj in gs[ii + 1 :]:
            for xi in daily_by_dow[gi]:
                for xj in daily_by_dow[gj]:
                    if xi < xj:
                        jt2 += 2
                    elif xi == xj:
                        jt2 += 1
    row = load_all()["stats_jonckheere_terpstra"].builder(spark, sf_dir).collect()[0]
    assert row["jt2"] == jt2
    sizes = [len(v) for v in daily_by_dow.values()]
    nn = sum(sizes)
    assert row["n_days"] == nn
    assert row["e2"] == (nn * nn - sum(s * s for s in sizes)) // 2
    # tie-corrected Hollander-Wolfe variance, recomputed with Python
    # exact ints: 72*N(N-1)(N-2)*Var = A*N(N-1)(N-2) + 2*Bg*Bt
    # + 9*(N-2)*Cg*Ct; var72 = floor(72*Var)
    tie_sizes = list(
        Counter(v for vs in daily_by_dow.values() for v in vs).values()
    )
    ga = sum(s * (s - 1) * (2 * s + 5) for s in sizes)
    gb = sum(s * (s - 1) * (s - 2) for s in sizes)
    gc = sum(s * (s - 1) for s in sizes)
    ta = sum(tv * (tv - 1) * (2 * tv + 5) for tv in tie_sizes)
    tb = sum(tv * (tv - 1) * (tv - 2) for tv in tie_sizes)
    tc = sum(tv * (tv - 1) for tv in tie_sizes)
    a = nn * (nn - 1) * (2 * nn + 5) - ga - ta
    dd = nn * (nn - 1) * (nn - 2)
    var_num = a * dd + 2 * gb * tb + 9 * (nn - 2) * gc * tc
    assert row["var72"] == (0 if nn <= 2 or var_num <= 0 else var_num // dd)
    # the fixture's daily volumes ARE tied — the correction must bite
    assert any(tv > 1 for tv in tie_sizes)
    import math

    if nn > 2 and var_num > 0:
        z = round(
            (jt2 - (nn * nn - sum(s * s for s in sizes)) // 2)
            * 0.5
            / math.sqrt(var_num / (72.0 * dd)),
            6,
        )
        assert row["z_jt"] == z


def test_ansari_bradley_matches_direct_midranks(spark, sf_dir):
    """Doubled Ansari score sums == direct computation with doubled
    midranks over the sorted merged sample."""
    ev = load(spark, sf_dir, "events").collect()
    per_day = defaultdict(Counter)
    for r in ev:
        per_day[r["ts"].date()][r["event_type"]] += 1
    xs = [c["click"] for c in per_day.values()]
    ys = [c["view"] for c in per_day.values()]
    merged = sorted([(v, "x") for v in xs] + [(v, "y") for v in ys])
    n = len(merged)
    # doubled midrank per value: 2*below + m + 1
    vals = Counter(v for v, _ in merged)
    below = 0
    dr = {}
    for v in sorted(vals):
        dr[v] = 2 * below + vals[v] + 1
        below += vals[v]
    ab2x = sum(min(dr[v], 2 * (n + 1) - dr[v]) for v in xs)
    ab2y = sum(min(dr[v], 2 * (n + 1) - dr[v]) for v in ys)
    row = load_all()["stats_ansari_bradley"].builder(spark, sf_dir).collect()[0]
    assert (row["nx"], row["ny"]) == (len(xs), len(ys))
    assert (row["ab2x"], row["ab2y"]) == (ab2x, ab2y)
    assert row["mean_x_milli"] == (1000 * ab2x) // (2 * len(xs))


def test_page_hinkley_matches_direct_recurrence(spark, sf_dir):
    """Per-type PH trajectory recomputed sequentially in Python."""
    ev = load(spark, sf_dir, "events").collect()
    per = defaultdict(Counter)
    for r in ev:
        per[r["event_type"]][r["ts"].date()] += 1
    rows = {
        r["event_type"]: r
        for r in load_all()["events_page_hinkley"].builder(spark, sf_dir).collect()
    }
    lam = 20_000_000
    for et, days in per.items():
        s = u = 0
        min_u = 0
        max_ph = 0
        n_alarms = 0
        first_alarm = None
        for i, day in enumerate(sorted(days), start=1):
            v = days[day]
            s += v
            d = v * 1_000_000 - (s * 1_000_000) // i
            u += d
            ph = u - min(min_u, u)
            min_u = min(min_u, u)
            max_ph = max(max_ph, ph)
            if ph > lam:
                n_alarms += 1
                first_alarm = first_alarm or day.isoformat()
        r = rows[et]
        assert r["n_days"] == len(days)
        assert r["max_ph_micro"] == max_ph
        assert r["n_alarm_days"] == n_alarms
        assert r["first_alarm_day"] == first_alarm


def test_knn_label_consistency_matches_bruteforce(spark, sf_dir):
    """5-NN purity recomputed with a brute-force quantized dot product."""
    import math

    emb = load(spark, sf_dir, "embeddings").collect()
    vecs = {
        r["vec_id"]: ([math.floor(float(x) * 200) for x in r["embedding"]], r["label"])
        for r in emb
    }
    out = {
        r["anchor_id"]: r
        for r in load_all()["embedding_knn_label_consistency"]
        .builder(spark, sf_dir)
        .collect()
    }
    anchors = [vid for vid in vecs if vid % 100 == 0]
    assert sorted(out) == sorted(anchors)
    for aid in anchors:
        aq, alab = vecs[aid]
        scored = sorted(
            (
                (-sum(a * b for a, b in zip(aq, q)), vid, lab)
                for vid, (q, lab) in vecs.items()
                if vid != aid
            ),
        )[:5]
        n_same = sum(1 for _, _, lab in scored if lab == alab)
        r = out[aid]
        assert r["anchor_label"] == alab
        assert r["n_same_label"] == n_same
        assert r["top1_same"] == (1 if scored[0][2] == alab else 0)


def test_hash_uniformity_matches_direct_md5(spark, sf_dir):
    """Bucket counts recomputed with hashlib's md5 — pins the
    '0x'||substr(md5(id),1,8) portable-hash contract cross-engine AND
    cross-runtime."""
    ev = load(spark, sf_dir, "events").collect()
    users = {r["user_id"] for r in ev if r["user_id"] is not None}
    occ = Counter(
        int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 16 for u in users
    )
    nu = len(users)
    cum = 0
    ks = 0
    chi_num = 0
    for b in range(16):
        o = occ.get(b, 0)
        cum += o
        ks = max(ks, abs(16 * cum - (b + 1) * nu))
        chi_num += (16 * o - nu) ** 2
    row = load_all()["stats_hash_uniformity_ks"].builder(spark, sf_dir).collect()[0]
    assert row["n_users"] == nu
    assert row["ks_d_16u"] == ks
    assert row["chi2_micro"] == (chi_num * 1_000_000) // (16 * nu)


def test_nmi_bounds_and_degenerate_zero(spark, sf_dir):
    """NMI lands in [0, 1] (milli, small rounding slack) on real data —
    and the mi/h sums are self-consistent (MI <= min(Hr, Hc))."""
    row = (
        load_all()["stats_normalized_mutual_info"].builder(spark, sf_dir).collect()[0]
    )
    assert 0 <= row["nmi_milli"] <= 1000
    assert row["mi_micro_n"] <= min(row["h_row_micro_n"], row["h_col_micro_n"]) + 10
    assert row["h_row_micro_n"] >= 0 and row["h_col_micro_n"] >= 0


def test_readability_formulas_match_direct(spark, sf_dir):
    """LIX/ARI recomputed for one source from the raw text."""
    import re

    docs = [r for r in load(spark, sf_dir, "documents").collect() if r["source"] == "src0"]
    w = sum(len(d["text"].split(" ")) for d in docs)
    s = sum(max(len(re.findall(r"[.!?]+", d["text"])), 1) for d in docs)
    lw = sum(sum(1 for tok in d["text"].split(" ") if len(tok) > 6) for d in docs)
    ch = sum(len(re.sub(r"[^A-Za-z0-9]", "", d["text"])) for d in docs)
    lix = {
        r["source"]: r
        for r in load_all()["text_lix_readability"].builder(spark, sf_dir).collect()
    }["src0"]
    assert (lix["words"], lix["sentences"], lix["long_words"]) == (w, s, lw)
    assert lix["lix_milli"] == (1000 * w) // s + (100000 * lw) // w
    ari = {
        r["source"]: r
        for r in load_all()["text_ari_coleman_liau"].builder(spark, sf_dir).collect()
    }["src0"]
    assert ari["chars_alnum"] == ch
    assert (
        ari["ari_milli"]
        == (4710 * ch * s + 500 * w * w - 21430 * w * s) // (w * s)
    )


def test_stickiness_bounds(spark, sf_dir):
    """DAU-sum/(days*MAU) is a proper ratio: 0 < stickiness <= 10000 bp,
    and dau_sum <= days * mau by construction."""
    rows = (
        load_all()["analytics_dau_mau_stickiness"].builder(spark, sf_dir).collect()
    )
    assert rows
    for r in rows:
        assert 0 < r["stickiness_bp"] <= 10_000
        assert r["dau_sum"] <= r["days"] * r["mau"]


def test_seasonal_mann_kendall_matches_direct(spark, sf_dir, daily_by_dow):
    """S_total and var18 recomputed from the per-stratum definitions —
    but NOTE the statistic pairs days in chronological order, so use
    the (dow -> chronological volumes) sequence, not sorted values."""
    ev = load(spark, sf_dir, "events").collect()
    per_day = Counter()
    for r in ev:
        per_day[r["ts"].date()] += 1
    strata = defaultdict(list)
    for day in sorted(per_day):
        strata[day.isoweekday()].append(per_day[day])
    s_total = 0
    var18 = 0
    for seq in strata.values():
        n = len(seq)
        for i in range(n):
            for j in range(i + 1, n):
                s_total += (seq[j] > seq[i]) - (seq[j] < seq[i])
        ties = Counter(seq)
        var18 += n * (n - 1) * (2 * n + 5) - sum(
            g * (g - 1) * (2 * g + 5) for g in ties.values()
        )
    row = (
        load_all()["stats_seasonal_mann_kendall"].builder(spark, sf_dir).collect()[0]
    )
    assert row["s_total"] == s_total
    assert row["var18"] == var18
    assert row["n_days"] == sum(len(v) for v in strata.values())


def test_centroid_drift_matches_direct(spark, sf_dir):
    """Per-label parity sum vectors recomputed with numpy floor."""
    import math

    emb = load(spark, sf_dir, "embeddings").collect()
    sums = defaultdict(lambda: [0] * 64)
    for r in emb:
        key = (r["label"], r["vec_id"] % 2)
        for i, x in enumerate(r["embedding"]):
            sums[key][i] += math.floor(float(x) * 200)
    out = {
        r["label"]: r
        for r in load_all()["embedding_centroid_drift_halves"]
        .builder(spark, sf_dir)
        .collect()
    }
    labels = {r["label"] for r in emb}
    assert set(out) == labels
    for lab in labels:
        se, so = sums[(lab, 0)], sums[(lab, 1)]
        dot = sum(a * b for a, b in zip(se, so))
        assert out[lab]["dot_q"] == dot
        n2e = sum(a * a for a in se)
        n2o = sum(b * b for b in so)
        if n2e and n2o:
            assert abs(out[lab]["cos_drift"] - dot / math.sqrt(n2e * n2o)) < 2e-6


def test_anderson_darling_matches_direct(spark, sf_dir):
    """A2 micro-sum recomputed from the Scholz-Stephens version-1
    definition over the merged support, with the same per-term floor."""
    ev = load(spark, sf_dir, "events").collect()
    per_day = defaultdict(Counter)
    for r in ev:
        per_day[r["ts"].date()][r["event_type"]] += 1
    xs = Counter(c["click"] for c in per_day.values())
    ys = Counter(c["view"] for c in per_day.values())
    m, n = sum(xs.values()), sum(ys.values())
    nn = m + n
    mx = my = b = 0
    a2 = 0
    n_terms = 0
    for v in sorted(set(xs) | set(ys)):
        l = xs.get(v, 0) + ys.get(v, 0)
        mx += xs.get(v, 0)
        my += ys.get(v, 0)
        b += l
        if b < nn:
            n_terms += 1
            a2 += (l * (nn * mx - m * b) ** 2 * 1_000_000) // (
                m * nn * b * (nn - b)
            )
            a2 += (l * (nn * my - n * b) ** 2 * 1_000_000) // (
                n * nn * b * (nn - b)
            )
    row = (
        load_all()["stats_anderson_darling_2s"].builder(spark, sf_dir).collect()[0]
    )
    assert (row["nx"], row["ny"]) == (m, n)
    assert row["n_terms"] == n_terms
    assert row["a2_micro"] == a2


def test_anderson_darling_term_survives_int64_overflow(spark):
    """The per-term squared-deviation numerator l*(nn*mx-m*b)^2*1e6
    exceeds int64 once the day spine passes ~650 days. Pin the
    DECIMAL(38,0) (Spark) and HUGEINT (DuckDB) accumulation against
    Python exact integers at multi-year-spine magnitudes, where the
    pre-fix BIGINT expression wrapped (Spark) or raised (DuckDB)."""
    import duckdb

    cases = [
        # (l, m, n, mx, my, b) — nn*mx-m*b ~ 4.8e9, squared ~ 2.3e19 > int64
        (3, 100_000, 100_000, 99_000, 51_000, 150_000),
        (7, 80_000, 120_000, 10_000, 95_000, 105_000),
        (1, 650, 650, 649, 1, 650),  # the ~650-day threshold regime
    ]
    spark_expr = (
        "CAST((CAST(l AS DECIMAL(38,0))"
        " * CAST(nn * mx - m * b AS DECIMAL(38,0))"
        " * CAST(nn * mx - m * b AS DECIMAL(38,0)) * 1000000)"
        " DIV (CAST(m AS DECIMAL(38,0)) * nn * b * (nn - b)) AS BIGINT)"
        " + CAST((CAST(l AS DECIMAL(38,0))"
        " * CAST(nn * my - n * b AS DECIMAL(38,0))"
        " * CAST(nn * my - n * b AS DECIMAL(38,0)) * 1000000)"
        " DIV (CAST(n AS DECIMAL(38,0)) * nn * b * (nn - b)) AS BIGINT)"
    )
    duck_expr = (
        "CAST((CAST(l AS HUGEINT)"
        " * CAST(nn * mx - m * b AS HUGEINT)"
        " * CAST(nn * mx - m * b AS HUGEINT) * 1000000)"
        " // (CAST(m AS HUGEINT) * nn * b * (nn - b)) AS BIGINT)"
        " + CAST((CAST(l AS HUGEINT)"
        " * CAST(nn * my - n * b AS HUGEINT)"
        " * CAST(nn * my - n * b AS HUGEINT) * 1000000)"
        " // (CAST(n AS HUGEINT) * nn * b * (nn - b)) AS BIGINT)"
    )
    for l, m, n, mx, my, b in cases:
        nn = m + n
        exact = (l * (nn * mx - m * b) ** 2 * 1_000_000) // (
            m * nn * b * (nn - b)
        ) + (l * (nn * my - n * b) ** 2 * 1_000_000) // (n * nn * b * (nn - b))
        assert abs(exact) < 2**63  # the SUMMED term still fits BIGINT
        row = spark.sql(
            f"SELECT {spark_expr} AS t FROM VALUES "
            f"(CAST({l} AS BIGINT), CAST({m} AS BIGINT), CAST({n} AS BIGINT),"
            f" CAST({mx} AS BIGINT), CAST({my} AS BIGINT),"
            f" CAST({b} AS BIGINT), CAST({nn} AS BIGINT))"
            " AS v(l, m, n, mx, my, b, nn)"
        ).collect()[0]
        assert row["t"] == exact, (l, m, n, mx, my, b)
        (dt,) = duckdb.sql(
            f"SELECT {duck_expr} AS t FROM (SELECT"
            f" CAST({l} AS BIGINT) l, CAST({m} AS BIGINT) m,"
            f" CAST({n} AS BIGINT) n, CAST({mx} AS BIGINT) mx,"
            f" CAST({my} AS BIGINT) my, CAST({b} AS BIGINT) b,"
            f" CAST({nn} AS BIGINT) nn)"
        ).fetchone()
        assert dt == exact, (l, m, n, mx, my, b)
