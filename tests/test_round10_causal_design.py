"""Round-10 wave 10 (operators/causal_design.py): deterministic
matching laws and exact-moment RD parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from owl_etl_spark.operators.causal_design import (
    nn_match_att,
    regression_discontinuity,
)

M = 1_000_000


def _match_df(spark, rows):
    return spark.createDataFrame(rows, "t boolean, s long, y long, id long")


def test_matching_picks_nearest_with_backward_tie(spark):
    rows = [
        (False, 10, 100, 1),
        (False, 20, 200, 2),
        (True, 14, 500, 3),   # nearer to 10 (d=4) than 20 (d=6) -> y_c=100
        (True, 15, 700, 4),   # equidistant (5/5) -> backward -> y_c=100
        (True, 19, 900, 5),   # nearer to 20 -> y_c=200
    ]
    r = nn_match_att(_match_df(spark, rows), "t", "s", "y", "id", caliper=100).collect()[0]
    assert (r.n_treated, r.n_control, r.n_matched, r.n_unmatched) == (3, 2, 3, 0)
    # matched control outcomes: 100, 100, 200 -> mean_c = 400/3
    assert r.mean_c_micro == (400 * M) // 3
    assert r.mean_t_micro == (2100 * M) // 3
    assert r.att_micro == ((2100 - 400) * M) // 3


def test_matching_equal_score_control_prefers_min_id(spark):
    rows = [
        (False, 10, 111, 7),
        (False, 10, 222, 2),   # same score: min id (2) must win
        (True, 10, 999, 9),
    ]
    r = nn_match_att(_match_df(spark, rows), "t", "s", "y", "id", caliper=0).collect()[0]
    assert r.n_matched == 1
    assert r.mean_c_micro == 222 * M


def test_matching_caliper_excludes_far_treated(spark):
    rows = [
        (False, 0, 50, 1),
        (True, 5, 80, 2),     # d=5 <= caliper
        (True, 1000, 90, 3),  # d=1000 > caliper -> unmatched
    ]
    r = nn_match_att(_match_df(spark, rows), "t", "s", "y", "id", caliper=10).collect()[0]
    assert (r.n_matched, r.n_unmatched) == (1, 1)
    assert r.att_micro == (80 - 50) * M


def test_matching_no_controls_is_null(spark):
    rows = [(True, 1, 10, 1), (True, 2, 20, 2)]
    r = nn_match_att(_match_df(spark, rows), "t", "s", "y", "id", caliper=10).collect()[0]
    assert r.n_matched == 0 and r.att_micro is None


def _ref_ols(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sx2 = sum(x * x for x, _ in pts)
    b = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    a = (sy - b * sx) / n
    return a, b


def test_rd_recovers_planted_jump(spark):
    # below: y = 10 + 0.5x (x<0); above: y = 30 + 0.5x — jump = 20
    pts = [(x, 10 + x // 2) for x in range(-50, 0, 2)] + [
        (x, 30 + x // 2) for x in range(0, 50, 2)
    ]
    df = spark.createDataFrame(pts, "x long, y long")
    r = regression_discontinuity(df, "x", "y", cutoff=0).collect()[0]
    ab, bb = _ref_ols([(x, y) for x, y in pts if x < 0])
    aa, ba = _ref_ols([(x, y) for x, y in pts if x >= 0])
    assert r.intercept_below_micro == pytest.approx(ab * M, abs=2)
    assert r.intercept_above_micro == pytest.approx(aa * M, abs=2)
    assert r.jump_micro == pytest.approx((aa - ab) * M, abs=3)
    assert abs(r.jump_micro - 20 * M) < M  # integer-floor slope wiggle


def test_rd_bandwidth_filters_far_points(spark):
    pts = [(-1000, 0), (-5, 10), (-3, 10), (3, 20), (5, 20), (1000, 99)]
    df = spark.createDataFrame(pts, "x long, y long")
    r = regression_discontinuity(df, "x", "y", cutoff=0, bandwidth=10).collect()[0]
    assert (r.n_below, r.n_above) == (2, 2)


def test_rd_degenerate_side_is_null(spark):
    pts = [(-5, 1), (3, 2), (4, 3)]  # below has n=1
    df = spark.createDataFrame(pts, "x long, y long")
    r = regression_discontinuity(df, "x", "y", cutoff=0).collect()[0]
    assert r.intercept_below_micro is None and r.jump_micro is None
    assert r.intercept_above_micro is not None


def test_rd_cutoff_centering(spark):
    # same data shifted by +100 with cutoff 100 must give identical fits
    pts = [(x, 3 * x + 7) for x in range(-10, 11)]
    df0 = spark.createDataFrame(pts, "x long, y long")
    df1 = spark.createDataFrame([(x + 100, y) for x, y in pts], "x long, y long")
    r0 = regression_discontinuity(df0, "x", "y", cutoff=0).collect()[0]
    r1 = regression_discontinuity(df1, "x", "y", cutoff=100).collect()[0]
    assert r0.jump_micro == r1.jump_micro
    assert r0.slope_below_micro == r1.slope_below_micro == 3 * M


# --- wave 11: RMST + Qini -------------------------------------------------

from owl_etl_spark.operators.rankagg import qini_curve
from owl_etl_spark.operators.survival_extras import rmst


def test_rmst_matches_hand_computed_km_area(spark):
    # 4 subjects: events at t=2 (1 of 4) and t=5 (1 of 2), censored at
    # t=3 and t=10. KM: S(2)=0.75, S(3)=0.75, S(5)=0.375, S(10)=0.375
    rows = [(2, 1), (3, 0), (5, 1), (10, 0)]
    df = spark.createDataFrame(rows, "dur long, ev long")
    r = rmst(df, "dur", "ev", tau=8).collect()[0]
    # area: [0,2)x1 + [2,3)x0.75 + [3,5)x0.75 + [5,8)x0.375
    expect = 2 + 1 * 0.75 + 2 * 0.75 + 3 * 0.375
    assert r.tau == 8
    # tolerance: the KM micro-nat floor under-counts each log term by
    # < 1e-6 nat (documented), so S is low by ~#terms ppm before its
    # round-6; area error ~ width x S x ppm x 1e6 per segment
    assert abs(r.rmst_micro - round(expect * M)) <= 15
    # tau below the first event: everyone alive -> rmst = tau exactly
    r1 = rmst(df, "dur", "ev", tau=2).collect()[0]
    assert r1.rmst_micro == 2 * M


def test_rmst_no_events_is_tau(spark):
    df = spark.createDataFrame([(7, 0), (9, 0)], "dur long, ev long")
    r = rmst(df, "dur", "ev", tau=5).collect()[0]
    assert r.rmst_micro == 5 * M  # S = 1 throughout [0, tau]


def test_rmst_rejects_bad_tau(spark):
    df = spark.createDataFrame([(1, 1)], "dur long, ev long")
    with pytest.raises(ValueError):
        rmst(df, "dur", "ev", tau=0)


def test_qini_planted_uplift_concentrates_at_top(spark):
    # top-scored treated convert, controls never; below: nobody
    rows = []
    rid = 0
    for i in range(40):
        s = 1000 - i
        rows.append((True, s, 1 if i < 10 else 0, rid)); rid += 1
        rows.append((False, s, 0, rid)); rid += 1
    df = spark.createDataFrame(rows, "t boolean, s long, y long, id long")
    out = {r.bucket: r for r in qini_curve(df, "t", "s", "y", "id").collect()}
    assert len(out) == 10
    # 80 rows -> 8 per bucket (4 treated / 4 control each)
    assert out[1].n_t == 4 and out[1].n_c == 4
    # all positives live in the top ~3 buckets' treated arm
    assert out[10].cum_pos_t == 10 and out[10].cum_pos_c == 0
    # qini = cum_pos_t - 0 -> monotone up to 10e6 then flat
    assert out[10].qini_micro == 10 * M
    assert out[1].qini_micro == out[1].cum_pos_t * M
    # per-bucket uplift positive at the top, zero at the bottom
    assert out[1].uplift_micro == M  # 4/4 - 0/4
    assert out[10].uplift_micro == 0


def test_qini_null_before_any_control(spark):
    # every control scores lowest -> first bucket has cum_n_c = 0
    rows = [(True, 100 - i, 0, i) for i in range(10)] + [
        (False, 1, 0, 100 + i) for i in range(2)
    ]
    df = spark.createDataFrame(rows, "t boolean, s long, y long, id long")
    out = qini_curve(df, "t", "s", "y", "id", n_buckets=4).orderBy("bucket").collect()
    assert out[0].qini_micro is None  # no controls seen yet
    assert out[-1].qini_micro is not None


# --- wave 11b: Harrell's C-index -------------------------------------------

from owl_etl_spark.operators.survival_extras import concordance_index


def _ref_cindex(rows):
    conc = ties = comp = 0
    for i, (ti, ei, ri) in enumerate(rows):
        if ei != 1:
            continue
        for j, (tj, ej, rj) in enumerate(rows):
            if tj > ti:
                comp += 1
                if ri > rj:
                    conc += 1
                elif ri == rj:
                    ties += 1
    return conc, ties, comp


def test_cindex_matches_bruteforce_with_censoring_and_ties(spark):
    rows = [
        (1, 1, 9), (2, 0, 5), (2, 1, 7), (3, 1, 7), (4, 0, 2),
        (5, 1, 3), (6, 0, 8), (7, 1, 1), (9, 0, 7),
    ]
    df = spark.createDataFrame(rows, "t long, e long, r long")
    got = concordance_index(df, "t", "e", "r").collect()[0]
    conc, ties, comp = _ref_cindex(rows)
    assert (got.concordant, got.risk_ties, got.comparable_pairs) == (conc, ties, comp)
    assert got.c_index_micro == ((2 * conc + ties) * M) // (2 * comp)


def test_cindex_perfect_score_is_one(spark):
    # risk exactly inversely ordered with survival time, all events
    rows = [(t, 1, 100 - t) for t in range(1, 8)]
    df = spark.createDataFrame(rows, "t long, e long, r long")
    got = concordance_index(df, "t", "e", "r").collect()[0]
    assert got.c_index_micro == M


def test_cindex_censored_only_is_null(spark):
    rows = [(1, 0, 5), (2, 0, 6)]
    df = spark.createDataFrame(rows, "t long, e long, r long")
    got = concordance_index(df, "t", "e", "r").collect()[0]
    assert got.comparable_pairs == 0 and got.c_index_micro is None


# --- wave 12: covariate balance table ---------------------------------------

from owl_etl_spark.operators.causal_design import balance_table


def test_balance_table_matches_reference(spark):
    import math

    rows = [
        (True, 10, 3), (True, 14, 5), (True, 12, 4),
        (False, 8, 9), (False, 6, 11), (False, 10, 10), (False, 7, 12),
    ]
    df = spark.createDataFrame(rows, "t boolean, a long, b long")
    out = {r.covariate: r for r in balance_table(df, "t", ["a", "b"]).collect()}

    def ref_smd(tv, cv):
        mt, mc = sum(tv) / len(tv), sum(cv) / len(cv)
        vt = sum((x - mt) ** 2 for x in tv) / (len(tv) - 1)
        vc = sum((x - mc) ** 2 for x in cv) / (len(cv) - 1)
        return (mt - mc) / math.sqrt((vt + vc) / 2)

    a_t, a_c = [10, 14, 12], [8, 6, 10, 7]
    b_t, b_c = [3, 5, 4], [9, 11, 10, 12]
    assert out["a"].n_t == 3 and out["a"].n_c == 4
    assert out["a"].smd_micro == pytest.approx(ref_smd(a_t, a_c) * M, abs=3)
    assert out["b"].smd_micro == pytest.approx(ref_smd(b_t, b_c) * M, abs=3)
    # planted direction: a higher in treated, b lower
    assert out["a"].smd_micro > 0 > out["b"].smd_micro


def test_balance_table_degenerate_spread_is_null(spark):
    rows = [(True, 5), (True, 5), (False, 5), (False, 5)]
    df = spark.createDataFrame(rows, "t boolean, a long")
    r = balance_table(df, "t", ["a"]).collect()[0]
    assert r.smd_micro is None and r.mean_t_micro == 5 * M


def test_balance_table_requires_covariates(spark):
    df = spark.createDataFrame([(True, 1)], "t boolean, a long")
    with pytest.raises(ValueError):
        balance_table(df, "t", [])
