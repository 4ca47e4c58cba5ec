"""Round-7 wave-7 operators: exact 1-D Wasserstein (wasserstein.py),
Poisson bootstrap (bootstrap.py), stratified ATE (experiment.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from owl_etl_spark.operators.bootstrap import _POIS1_THRESH, poisson_bootstrap_ci
from owl_etl_spark.operators.experiment import stratified_ate
from owl_etl_spark.operators.wasserstein import wasserstein_1d_pairs


# ------------------------------------------------------------- Wasserstein


def _w1_df(spark, a_vals, b_vals):
    rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    return spark.createDataFrame(rows, "k string, v long")


def test_w1_shifted_point_masses(spark):
    # delta at 0 vs delta at 7: W1 = 7 exactly
    out = wasserstein_1d_pairs(_w1_df(spark, [0, 0, 0], [7, 7, 7]), "k", "v").collect()
    assert len(out) == 1
    assert out[0].w1_micro == 7 * 1_000_000


def test_w1_identical_distributions_zero(spark):
    vals = [1, 5, 5, 9]
    out = wasserstein_1d_pairs(_w1_df(spark, vals, vals), "k", "v").collect()
    assert out[0].w1_micro == 0


def test_w1_matches_scipy_style_reference(spark):
    rng = np.random.default_rng(4)
    a = rng.integers(0, 1000, size=300).tolist()
    b = (rng.integers(0, 1000, size=200) + 100).tolist()
    out = wasserstein_1d_pairs(_w1_df(spark, a, b), "k", "v").collect()[0]
    # independent reference: mean |sorted quantile functions| via the
    # standard pooled-support CDF integral
    support = sorted(set(a) | set(b))
    ca = cb = 0.0
    ref = 0.0
    na, nb = len(a), len(b)
    from collections import Counter

    cnt_a, cnt_b = Counter(a), Counter(b)
    for i, v in enumerate(support[:-1]):
        ca += cnt_a[v] / na
        cb += cnt_b[v] / nb
        ref += abs(ca - cb) * (support[i + 1] - v)
    assert abs(out.w1_micro / 1e6 - ref) < 1e-3, (out.w1_micro / 1e6, ref)


def test_w1_asymmetric_sizes_ok(spark):
    out = wasserstein_1d_pairs(_w1_df(spark, [0] * 10, [10]), "k", "v").collect()[0]
    assert out.n_a == 10 and out.n_b == 1
    assert out.w1_micro == 10 * 1_000_000


def test_w1_headroom_guard_raises(spark):
    df = _w1_df(spark, [0, 10**7], [10**7, 0])
    with pytest.raises(Exception, match="headroom"):
        wasserstein_1d_pairs(df, "k", "v", max_product=10).collect()


# --------------------------------------------------------- Poisson bootstrap


def test_pois1_thresholds_are_the_cdf():
    # spot-check the baked thresholds against math.exp
    cdf = 0.0
    term = math.exp(-1.0)
    for k, t in enumerate(_POIS1_THRESH):
        cdf += term
        assert abs(t / 2**60 - min(cdf, 1.0)) < 1e-12
        term /= k + 1


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    rows = [("g", int(v), i) for i, v in enumerate(
        np.random.default_rng(2).integers(0, 1000, size=2000)
    )]
    df = spark.createDataFrame(rows, "g string, v long, k long")
    out1 = poisson_bootstrap_ci(df, "g", "v", "k").collect()[0]
    out2 = poisson_bootstrap_ci(
        spark.createDataFrame(rows, "g string, v long, k long").repartition(9),
        "g", "v", "k",
    ).collect()[0]
    assert out1.asDict() == out2.asDict()
    assert out1.ci_lo_micro <= out1.mean_micro <= out1.ci_hi_micro
    # CI width should be a few standard errors, not degenerate
    se = 1000 / math.sqrt(12) / math.sqrt(2000) * 1e6
    width = out1.ci_hi_micro - out1.ci_lo_micro
    assert 0.5 * se < width < 10 * se


def test_bootstrap_constant_data_zero_width(spark):
    rows = [("g", 42, i) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, v long, k long")
    out = poisson_bootstrap_ci(df, "g", "v", "k").collect()[0]
    assert out.ci_lo_micro == out.ci_hi_micro == out.mean_micro == 42 * 10**6


def test_bootstrap_guards(spark):
    df = spark.createDataFrame([("g", 1, 1)], "g string, v long, k long")
    with pytest.raises(ValueError, match="n_replicates"):
        poisson_bootstrap_ci(df, "g", "v", "k", n_replicates=2)
    with pytest.raises(ValueError, match="alpha_bp"):
        poisson_bootstrap_ci(df, "g", "v", "k", alpha_bp=0)


# ------------------------------------------------------------ stratified ATE


def test_stratified_ate_removes_planted_confounding(spark):
    # stratum A: treated-heavy with high baseline; stratum B: control-
    # heavy with low baseline. True within-stratum effect is +10
    # everywhere; the raw pooled diff is badly confounded.
    rows = []
    rows += [("A", 1, 110)] * 80 + [("A", 0, 100)] * 20
    rows += [("B", 1, 30)] * 20 + [("B", 0, 20)] * 80
    df = spark.createDataFrame(rows, "s string, t int, y long")
    out = {r.stratum: r for r in stratified_ate(df, "s", "t", "y").collect()}
    assert out["A"].diff_micro == 10 * 10**6
    assert out["B"].diff_micro == 10 * 10**6
    ate = sum(r.ate_term_micro for r in out.values())
    assert abs(ate - 10 * 10**6) <= 2  # exact up to floor-div quanta
    # raw pooled diff for contrast: heavily confounded
    t_mean = (80 * 110 + 20 * 30) / 100
    c_mean = (20 * 100 + 80 * 20) / 100
    assert abs(t_mean - c_mean - 10) > 40


def test_stratified_ate_one_arm_stratum_excluded(spark):
    rows = [("A", 1, 10), ("A", 0, 5), ("C", 1, 99)]
    df = spark.createDataFrame(rows, "s string, t int, y long")
    out = {r.stratum: r for r in stratified_ate(df, "s", "t", "y").collect()}
    assert out["C"].diff_micro is None and out["C"].weight_micro is None
    assert out["A"].weight_micro == 10**6  # all two-arm mass in A
