"""Wave-13 round-6 operators: KS two-sample test, Mann-Whitney U,
chi-square + Cramér's V (operators/stats_tests.py)."""

from __future__ import annotations

import math
import random

import pytest

from owl_etl_spark.operators.stats_tests import (
    chi_square_report,
    ks_test_report,
    mann_whitney_u,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["k", "v", "s"])


# --------------------------------------------------------------------- KS


def test_ks_complete_separation(spark):
    rows = [("g", v, "a") for v in (1, 2, 3)] + [("g", v, "b") for v in (4, 5, 6)]
    r = ks_test_report(_mk(spark, rows), ["k"], "v", "s", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["d_num"] == 9 and r["ks_d"] == 1.0


def test_ks_identical_distributions_zero(spark):
    rows = [("g", v, s) for v in (1, 2, 3) for s in ("a", "b")]
    r = ks_test_report(_mk(spark, rows), ["k"], "v", "s", "a", "b").collect()[0]
    assert r["d_num"] == 0 and r["ks_d"] == 0.0


def _py_ks(a, b):
    vals = sorted(set(a) | set(b))
    best = 0
    for v in vals:
        ra = sum(1 for x in a if x <= v)
        rb = sum(1 for x in b if x <= v)
        best = max(best, abs(ra * len(b) - rb * len(a)))
    return best


def test_ks_matches_reference_randomized(spark):
    rnd = random.Random(3)
    a = [rnd.randint(0, 15) for _ in range(40)]
    b = [rnd.randint(3, 20) for _ in range(25)]
    rows = [("g", v, "a") for v in a] + [("g", v, "b") for v in b]
    r = ks_test_report(_mk(spark, rows), ["k"], "v", "s", "a", "b").collect()[0]
    assert r["d_num"] == _py_ks(a, b)
    assert r["ks_d"] == round(_py_ks(a, b) / (40 * 25), 6)


def test_ks_other_sides_excluded(spark):
    rows = [("g", 1, "a"), ("g", 9, "b"), ("g", 100, "c"), ("g", None, "a")]
    r = ks_test_report(_mk(spark, rows), ["k"], "v", "s", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (1, 1)


# -------------------------------------------------------------------- MWU


def test_mwu_hand_case(spark):
    # a=[1,2], b=[3,4]: U_a = 0, z = (0-2)/sqrt(4*5/12) = -1.549193
    rows = [("g", 1, "a"), ("g", 2, "a"), ("g", 3, "b"), ("g", 4, "b")]
    r = mann_whitney_u(_mk(spark, rows), ["k"], "v", "s", "a", "b").collect()[0]
    assert r["u2_a"] == 0
    assert r["z"] == round((0 - 2) / math.sqrt(4 * 5 / 12), 6)


def test_mwu_all_tied_z_null(spark):
    rows = [("g", 5, s) for s in ("a", "a", "b", "b")]
    r = mann_whitney_u(_mk(spark, rows), ["k"], "v", "s", "a", "b").collect()[0]
    assert r["u2_a"] == 4  # 2U = n_a*n_b when every pair is a half-tie
    assert r["z"] is None


def _py_u2(a, b):
    # 2*U_a via brute pair counting: wins*2 + ties
    u2 = 0
    for x in a:
        for y in b:
            if x > y:
                u2 += 2
            elif x == y:
                u2 += 1
    return u2


def test_mwu_matches_pair_counting_randomized(spark):
    rnd = random.Random(5)
    a = [rnd.randint(0, 10) for _ in range(30)]
    b = [rnd.randint(2, 12) for _ in range(20)]
    rows = [("g", v, "a") for v in a] + [("g", v, "b") for v in b]
    r = mann_whitney_u(_mk(spark, rows), ["k"], "v", "s", "a", "b").collect()[0]
    assert r["u2_a"] == _py_u2(a, b)


def test_mwu_group_guard(spark):
    rows = [("g", i, "a" if i % 2 else "b") for i in range(50)]
    with pytest.raises(Exception, match="max_group_rows"):
        mann_whitney_u(
            _mk(spark, rows), ["k"], "v", "s", "a", "b", max_group_rows=10
        ).collect()


# ------------------------------------------------------------- chi-square


def test_chi2_perfect_association(spark):
    rows = [("g", "x1", "y1")] * 10 + [("g", "x2", "y2")] * 10
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    r = chi_square_report(df, ["k"], "x", "y").collect()[0]
    assert (r["n"], r["n_x"], r["n_y"], r["dof"]) == (20, 2, 2, 1)
    assert r["chi2_micro"] == 20_000_000  # chi2 == n for a perfect 2x2
    assert r["cramers_v"] == 1.0


def test_chi2_independent_zero(spark):
    rows = [("g", x, y) for x in ("x1", "x2") for y in ("y1", "y2") for _ in range(5)]
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    r = chi_square_report(df, ["k"], "x", "y").collect()[0]
    assert r["chi2_micro"] == 0 and r["cramers_v"] == 0.0


def test_chi2_includes_empty_cells(spark):
    # 2x2 with one empty cell: O = [[4,4],[4,0]]
    rows = (
        [("g", "x1", "y1")] * 4 + [("g", "x1", "y2")] * 4 + [("g", "x2", "y1")] * 4
    )
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    r = chi_square_report(df, ["k"], "x", "y").collect()[0]
    # brute: n=12, cx=(8,4), cy=(8,4); chi2 = sum over 4 cells incl. (x2,y2)
    def term(o, cx, cy):
        return round(1e6 * (o * 12 - cx * cy) ** 2 / (12 * cx * cy))
    expected = term(4, 8, 8) + term(4, 8, 4) + term(4, 4, 8) + term(0, 4, 4)
    assert r["chi2_micro"] == expected


def test_chi2_degenerate_grid_null_v(spark):
    rows = [("g", "only_x", y) for y in ("y1", "y2", "y1")]
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    r = chi_square_report(df, ["k"], "x", "y").collect()[0]
    assert r["dof"] == 0 and r["cramers_v"] is None
