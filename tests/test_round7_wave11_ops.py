"""Round-7 wave-11 operators: log-rank test (survival.py), Hill tail
index (stats_tests.py), cross-validated logistic (logreg.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from owl_etl_spark.operators.logreg import cv_logistic_report
from owl_etl_spark.operators.stats_tests import hill_tail_index
from owl_etl_spark.operators.survival import logrank_test


# ---------------------------------------------------------------- log-rank


def test_logrank_identical_groups_near_zero(spark):
    rows = [(t, 1, g) for g in ("a", "b") for t in range(1, 51)]
    df = spark.createDataFrame(rows, "t long, e long, g string")
    r = logrank_test(df, "t", "e", "g").collect()[0]
    assert r.n1 == 50 and r.n2 == 50
    # identical survival: O1 equals E1 up to micro quantization
    assert abs(r.o1 * 10**6 - r.e1_micro) < 100
    assert r.chi2 is not None and r.chi2 < 0.01


def test_logrank_separated_groups_large_chi2(spark):
    # group a all events early, group b all late: maximal separation
    rows = [(t, 1, "a") for t in range(1, 41)]
    rows += [(t + 100, 1, "b") for t in range(1, 41)]
    df = spark.createDataFrame(rows, "t long, e long, g string")
    r = logrank_test(df, "t", "e", "g").collect()[0]
    assert r.chi2 > 30  # wildly significant


def test_logrank_matches_float_reference(spark):
    rng = np.random.default_rng(8)
    rows = [(int(t), int(rng.random() < 0.8), "a") for t in rng.integers(1, 40, 120)]
    rows += [(int(t), int(rng.random() < 0.8), "b") for t in rng.integers(5, 60, 150)]
    df = spark.createDataFrame(rows, "t long, e long, g string")
    r = logrank_test(df, "t", "e", "g").collect()[0]
    # independent float implementation
    from collections import defaultdict

    times = sorted({t for t, e, g in rows if e})
    o1 = e1 = v = 0.0
    for t in times:
        d1 = sum(1 for tt, e, g in rows if tt == t and e and g == "a")
        d2 = sum(1 for tt, e, g in rows if tt == t and e and g == "b")
        n1 = sum(1 for tt, _, g in rows if tt >= t and g == "a")
        n2 = sum(1 for tt, _, g in rows if tt >= t and g == "b")
        d, n = d1 + d2, n1 + n2
        if d == 0:
            continue
        o1 += d1
        e1 += d * n1 / n
        if n > 1:
            v += d * (n1 / n) * (n2 / n) * (n - d) / (n - 1)
    ref = (o1 - e1) ** 2 / v
    assert abs(r.chi2 - ref) < 0.05, (r.chi2, ref)


def test_logrank_needs_two_groups(spark):
    df = spark.createDataFrame([(1, 1, "only")], "t long, e long, g string")
    with pytest.raises(ValueError, match="exactly 2"):
        logrank_test(df, "t", "e", "g")


# -------------------------------------------------------------- Hill index


def test_hill_recovers_planted_pareto(spark):
    # exact Pareto(α=2) quantiles: x_i = round(1e6 / sqrt(u_i))
    import random

    rnd = random.Random(3)
    rows = [("g", round(1_000_000 / math.sqrt(rnd.random() + 1e-12)))
            for _ in range(3000)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = hill_tail_index(df, "g", "v", k_cap=300).collect()[0]
    assert r.k == 300
    alpha = r.alpha_micro / 1e6
    assert 1.5 < alpha < 2.6, alpha


def test_hill_light_tail_large_alpha(spark):
    # uniform values: tail decays faster than any power law -> big α̂
    rows = [("g", v) for v in range(1000, 2001)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = hill_tail_index(df, "g", "v").collect()[0]
    assert r.alpha_micro / 1e6 > 5


def test_hill_nonpositive_excluded(spark):
    rows = [("g", v) for v in range(-50, 200)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = hill_tail_index(df, "g", "v").collect()[0]
    assert r.n == 199  # only the positives


# ------------------------------------------------------------- CV logistic


def _feat_rows(spark, n=400):
    import random

    rnd = random.Random(5)
    rows = []
    for i in range(n):
        x = rnd.randrange(0, 10)
        y = 1 if rnd.random() < 1 / (1 + math.exp(-(x - 5))) else 0
        rows.append((y, 1, x, i))
    return spark.createDataFrame(rows, "y long, bias long, x long, k long")


def test_cv_folds_cover_everything_and_are_deterministic(spark):
    df = _feat_rows(spark)
    out = cv_logistic_report(df, "y", ["bias", "x"], "k", folds=2, iterations=5)
    rows = out.collect()
    assert len(rows) == 2
    assert rows[0].n_train + rows[0].n_test == 400
    assert rows[0].n_test == rows[1].n_train
    again = cv_logistic_report(
        df.repartition(9), "y", ["bias", "x"], "k", folds=2, iterations=5
    ).collect()
    assert [r.asDict() for r in rows] == [r.asDict() for r in again]


def test_cv_learns_signal(spark):
    df = _feat_rows(spark, 800)
    out = cv_logistic_report(df, "y", ["bias", "x"], "k", folds=2, iterations=20)
    for r in out.collect():
        assert r.w_x > 0  # positive slope on the planted signal
        # held-out loss beats the coin-flip baseline ln2 per row
        assert r.test_logloss_micro_nats < r.n_test * round(math.log(2) * 1e6)


def test_cv_folds_guard(spark):
    df = _feat_rows(spark, 10)
    with pytest.raises(ValueError, match="folds"):
        cv_logistic_report(df, "y", ["bias", "x"], "k", folds=1)
