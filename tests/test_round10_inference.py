"""Round-10 waves 5/6 (operators/inference.py, operators/rankagg.py):
parity against independent pure-Python references, planted-verdict
cases, and degenerate-input contracts for one-way ANOVA,
Kruskal-Wallis, Brown-Forsythe, CMH, the BH-FDR screen, Borda/
Copeland rank fusion, and the decile lift table."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from owl_etl_spark.operators.inference import (
    anova_oneway,
    brown_forsythe,
    cmh_test,
    fdr_bh_screen,
    kruskal_wallis,
)
from owl_etl_spark.operators.rankagg import borda_copeland, decile_lift

M = 1_000_000


def _gv_df(spark, groups: dict[str, list[int]]):
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    return spark.createDataFrame(rows, "g string, v long")


# ---------------------------------------------------------------------------
# pure-Python references (no scipy in the container — by design: an
# INDEPENDENT derivation from the textbook formulas)
# ---------------------------------------------------------------------------


def _ref_anova_f(groups: dict[str, list[int]]) -> float:
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    grand = sum(sum(v) for v in groups.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values()
    )
    return (ssb / (k - 1)) / (ssw / (n - k))


def _ref_kw_h(groups: dict[str, list[int]]) -> float:
    allv = sorted(v for vs in groups.values() for v in vs)
    n = len(allv)
    # average ranks with ties
    rank_of: dict[int, float] = {}
    i = 0
    while i < n:
        j = i
        while j < n and allv[j] == allv[i]:
            j += 1
        rank_of[allv[i]] = (i + 1 + j) / 2
        i = j
    h = 12.0 / (n * (n + 1)) * sum(
        (sum(rank_of[x] for x in vs)) ** 2 / len(vs) for vs in groups.values()
    ) - 3 * (n + 1)
    from collections import Counter

    t = Counter(allv)
    c = 1.0 - sum(x**3 - x for x in t.values()) / (n**3 - n)
    return h / c


def test_anova_matches_reference(spark):
    groups = {
        "a": [10, 12, 9, 11, 14, 10],
        "b": [22, 25, 19, 24, 21],
        "c": [15, 14, 17, 13, 16, 18, 15],
    }
    row = anova_oneway(_gv_df(spark, groups), "g", "v").collect()[0]
    assert row.k_groups == 3 and row.n == 18
    assert row.f_micro == pytest.approx(_ref_anova_f(groups) * M, abs=3)
    # eta² must sit in (0, 1) micro and agree with ssb/(ssb+ssw)
    assert 0 < row.eta2_micro < M
    assert row.eta2_micro == pytest.approx(
        M * row.ssb_micro / (row.ssb_micro + row.ssw_micro), abs=1
    )


def test_anova_degenerate_is_null_not_wrong(spark):
    # all values identical -> SSW = 0 -> F/eta2 NULL, moments still real
    row = anova_oneway(
        _gv_df(spark, {"a": [5, 5, 5], "b": [5, 5]}), "g", "v"
    ).collect()[0]
    assert row.f_micro is None and row.eta2_micro is None
    assert row.ssw_micro == 0
    # single group -> NULL as well
    row1 = anova_oneway(_gv_df(spark, {"a": [1, 2, 3]}), "g", "v").collect()[0]
    assert row1.f_micro is None


def test_kruskal_wallis_matches_reference_with_ties(spark):
    groups = {
        "a": [1, 2, 2, 3, 7],
        "b": [3, 3, 4, 9, 9],
        "c": [5, 5, 5, 6, 1],
    }
    row = kruskal_wallis(_gv_df(spark, groups), "g", "v").collect()[0]
    assert row.k_groups == 3 and row.n == 15 and row.dof == 2
    assert row.h_corrected_micro == pytest.approx(_ref_kw_h(groups) * M, abs=3)
    # tie sum: value 2 (t=2), 3 (t=3), 5 (t=3), 9 (t=2), 1 (t=2)
    assert row.tie_cube_sum == (8 - 2) + (27 - 3) + (27 - 3) + (8 - 2) + (8 - 2)


def test_kruskal_wallis_all_tied_is_null(spark):
    row = kruskal_wallis(
        _gv_df(spark, {"a": [7, 7], "b": [7, 7, 7]}), "g", "v"
    ).collect()[0]
    assert row.h_micro is None and row.h_corrected_micro is None


def test_brown_forsythe_matches_manual_deviations(spark):
    groups = {
        "lo": [10, 11, 12, 13, 14],  # tight
        "hi": [0, 10, 20, 30, 100],  # wide
    }
    row = brown_forsythe(_gv_df(spark, groups), "g", "v").collect()[0]
    # manual: medians 12 and 20; ANOVA on doubled |dev|
    dev = {
        "lo": [abs(2 * x - 24) for x in groups["lo"]],
        "hi": [abs(2 * x - 40) for x in groups["hi"]],
    }
    assert row.f_micro == pytest.approx(_ref_anova_f(dev) * M, abs=3)
    # wide group must dominate: the test flags heteroscedasticity
    assert row.f_micro > 2 * M


def test_brown_forsythe_even_count_median_is_exact(spark):
    # even n: 2*median of [1, 3] = 4 -> deviations |2v-4| = [2, 2]
    groups = {"a": [1, 3], "b": [0, 100, 0, 100]}
    row = brown_forsythe(_gv_df(spark, groups), "g", "v").collect()[0]
    # group b: 2*median = 100, devs = [100, 100, 100, 100]; both groups
    # have zero within-variance on |dev| -> SSW = 0 -> NULL F
    assert row.f_micro is None and row.ssw_micro == 0


def _cmh_df(spark, strata):
    rows = []
    for s, (a, b, c, d) in strata.items():
        rows += [(s, True, True)] * a + [(s, True, False)] * b
        rows += [(s, False, True)] * c + [(s, False, False)] * d
    return spark.createDataFrame(rows, "s string, t boolean, o boolean")


def test_cmh_matches_reference(spark):
    strata = {"s1": (12, 8, 5, 15), "s2": (7, 13, 9, 11), "s3": (20, 5, 10, 15)}
    row = cmh_test(_cmh_df(spark, strata), "s", "t", "o").collect()[0]
    sa = se = sv = on = od = 0.0
    for a, b, c, d in strata.values():
        n = a + b + c + d
        sa += a
        se += (a + b) * (a + c) / n
        sv += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        on += a * d / n
        od += b * c / n
    ref = (abs(sa - se) - 0.5) ** 2 / sv
    assert row.n_strata == 3 and row.sum_a == int(sa)
    assert row.cmh_micro == pytest.approx(ref * M, abs=5)
    assert row.or_mh_micro == pytest.approx(on / od * M, abs=5)


def test_cmh_null_association_scores_near_zero(spark):
    # independent cells: a/b = c/d in every stratum -> tiny CMH, OR ~ 1
    strata = {"s1": (10, 10, 10, 10), "s2": (20, 10, 20, 10)}
    row = cmh_test(_cmh_df(spark, strata), "s", "t", "o").collect()[0]
    assert row.cmh_micro is None or row.cmh_micro < M // 10
    assert abs(row.or_mh_micro - M) < M // 100


def test_fdr_screen_rejects_planted_signal_only(spark):
    # 3 null groups (cohort-independent values) + 1 planted group where
    # side=True values are shifted far beyond permutation noise
    rows = []
    k = 0
    for g in ["n1", "n2", "n3"]:
        for i in range(60):
            rows.append((g, i % 2 == 0, 100 + (i * 7) % 13, str(k)))
            k += 1
    for i in range(60):
        rows.append(("sig", i % 2 == 0, 1000 if i % 2 == 0 else 100, str(k)))
        k += 1
    df = spark.createDataFrame(rows, "g string, side boolean, v long, k string")
    out = {r.group: r for r in fdr_bh_screen(df, "g", "side", "v", "k").collect()}
    assert len(out) == 4
    assert out["sig"].rejected == 1 and out["sig"].p_rank == 1
    # planted p is the floor (no permutation reaches the shift)
    assert out["sig"].p_micro == (1 * M) // (out["sig"].n_perms_used + 1)
    for g in ["n1", "n2", "n3"]:
        assert out[g].rejected == 0
    # BH crit line is monotone in rank
    crits = [r.bh_crit_micro for r in sorted(out.values(), key=lambda r: r.p_rank)]
    assert crits == sorted(crits)


def test_fdr_bh_step_up_rejects_everything_below_largest_passing_rank(spark):
    # construct p-ranks where rank 1 fails but a later rank passes:
    # step-up must reject ALL ranks <= the largest passing one. We
    # check the law on the operator's own outputs rather than planting
    # exact p's (permutation p's are data-driven): recompute the rule.
    rows = []
    k = 0
    for gi, shift in enumerate([500, 450, 400, 0, 0]):
        g = f"g{gi}"
        for i in range(40):
            v = 100 + (i * 11) % 17 + (shift if i % 2 == 0 else 0)
            rows.append((g, i % 2 == 0, v, str(k)))
            k += 1
    df = spark.createDataFrame(rows, "g string, side boolean, v long, k string")
    got = fdr_bh_screen(df, "g", "side", "v", "k").collect()
    m = len(got)
    passing = [
        r.p_rank
        for r in got
        if (r.n_ge + 1) * m * 10 <= r.p_rank * (r.n_perms_used + 1)
    ]
    cutoff = max(passing) if passing else 0
    for r in got:
        assert bool(r.rejected) == (r.p_rank <= cutoff)


def test_borda_copeland_textbook_profile(spark):
    # candidates A,B,C; 3 rankers by score (higher = better)
    rows = [
        ("A", "r1", 30), ("B", "r1", 20), ("C", "r1", 10),
        ("A", "r2", 10), ("B", "r2", 30), ("C", "r2", 20),
        ("A", "r3", 30), ("B", "r3", 10), ("C", "r3", 20),
    ]
    df = spark.createDataFrame(rows, "c string, rk string, s long")
    out = {r.candidate: r for r in borda_copeland(df, "c", "rk", "s").collect()}
    # ranks: r1 A>B>C, r2 B>C>A, r3 A>C>B
    # borda (n=3, points 2/1/0): A=2+0+2=4, B=1+2+0=3, C=0+1+1=2
    assert out["A"].borda_points == 4
    assert out["B"].borda_points == 3
    assert out["C"].borda_points == 2
    # pairwise: A beats B 2-1, A beats C 2-1, B beats C 2-1 ->
    # copeland A=+2, B=0, C=-2
    assert out["A"].copeland_score == 2
    assert out["B"].copeland_score == 0
    assert out["C"].copeland_score == -2
    assert out["A"].borda_rank == 1 and out["A"].copeland_rank == 1


def test_borda_copeland_condorcet_cycle_is_a_tie(spark):
    # rock-paper-scissors profile: every candidate beats one and loses
    # to one -> all copeland scores 0
    rows = [
        ("A", "r1", 3), ("B", "r1", 2), ("C", "r1", 1),
        ("B", "r2", 3), ("C", "r2", 2), ("A", "r2", 1),
        ("C", "r3", 3), ("A", "r3", 2), ("B", "r3", 1),
    ]
    df = spark.createDataFrame(rows, "c string, rk string, s long")
    out = borda_copeland(df, "c", "rk", "s").collect()
    assert all(r.copeland_score == 0 for r in out)
    assert all(r.borda_points == 3 for r in out)


def test_decile_lift_exact_counts_and_lift(spark):
    # 100 rows, scores 100..1; positives exactly the top 20 scores
    rows = [(100 - i, 1 if i < 20 else 0, i) for i in range(100)]
    df = spark.createDataFrame(rows, "s long, y long, id long")
    out = {r.bucket: r for r in decile_lift(df, "s", "y", "id").collect()}
    assert len(out) == 10 and all(out[b].n == 10 for b in out)
    assert out[1].n_pos == 10 and out[2].n_pos == 10 and out[3].n_pos == 0
    # top decile lift = (10/10)/(20/100) = 5x
    assert out[1].lift_micro == 5 * M
    # cumulative capture after 2 deciles = 100%
    assert out[2].cum_capture_micro == M
    assert out[10].cum_lift_micro == M  # full population = base rate


def test_decile_lift_no_positives_yields_null_ratios(spark):
    rows = [(i, 0, i) for i in range(30)]
    df = spark.createDataFrame(rows, "s long, y long, id long")
    out = decile_lift(df, "s", "y", "id").collect()
    assert all(r.lift_micro is None and r.cum_capture_micro is None for r in out)
    assert all(r.rate_micro == 0 for r in out)


def test_decile_lift_uneven_population_follows_ansi_ntile(spark):
    # 23 rows over 10 buckets: first 3 buckets get 3 rows, rest 2
    rows = [(i, 0, i) for i in range(23)]
    df = spark.createDataFrame(rows, "s long, y long, id long")
    sizes = [r.n for r in decile_lift(df, "s", "y", "id").orderBy("bucket").collect()]
    assert sizes == [3, 3, 3, 2, 2, 2, 2, 2, 2, 2]
