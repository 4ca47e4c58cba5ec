"""Round-7 wave-15 operators: permutation mean test (stats_tests.py),
quadratic-kernel MMD (embdrift.py)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from owl_etl_spark.operators.embdrift import quadratic_mmd
from owl_etl_spark.operators.stats_tests import permutation_mean_test


# ---------------------------------------------------------- permutation test


def _two_groups(spark, mu_a, mu_b, n=300, seed=1):
    rng = np.random.default_rng(seed)
    rows = [("a", int(rng.normal(mu_a, 50)), i) for i in range(n)]
    rows += [("b", int(rng.normal(mu_b, 50)), n + i) for i in range(n)]
    return spark.createDataFrame(rows, "g string, v long, k long")


def test_perm_null_effect_large_p(spark):
    df = _two_groups(spark, 500, 500)
    r = permutation_mean_test(df, "g", "v", "k", n_perms=64).collect()[0]
    assert r.p_value_micro > 100_000  # no effect: p stays large


def test_perm_planted_effect_small_p(spark):
    df = _two_groups(spark, 500, 700)
    r = permutation_mean_test(df, "g", "v", "k", n_perms=64).collect()[0]
    # 4-sigma-scale separation: no pseudo-permutation should beat it
    assert r.n_ge == 0
    assert r.p_value_micro == 10**6 // 65  # (0+1)/(64+1)


def test_perm_deterministic_under_repartition(spark):
    df = _two_groups(spark, 500, 560, n=150, seed=3)
    a = permutation_mean_test(df, "g", "v", "k").collect()[0]
    b = permutation_mean_test(df.repartition(9), "g", "v", "k").collect()[0]
    assert a.asDict() == b.asDict()


def test_perm_guards(spark):
    one = spark.createDataFrame([("a", 1, 1)], "g string, v long, k long")
    with pytest.raises(ValueError, match="exactly 2"):
        permutation_mean_test(one, "g", "v", "k")
    df = _two_groups(spark, 1, 1, n=5)
    with pytest.raises(ValueError, match="n_perms"):
        permutation_mean_test(df, "g", "v", "k", n_perms=2)


# -------------------------------------------------------------------- MMD


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_mmd_same_distribution_near_zero(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(400, 64))
    a, b = _emb(spark, X[:200]), _emb(spark, X[200:])
    r = quadratic_mmd(a, b).collect()[0]
    base = quadratic_mmd(a, a).collect()[0]
    assert base.mmd2 == 0.0
    assert abs(r.mmd2) < 50  # sampling noise scale for these moments


def test_mmd_covariance_shift_detected(spark):
    rng = np.random.default_rng(8)
    X = rng.normal(size=(200, 64))
    Y = rng.normal(size=(200, 64)) * 3.0  # inflated covariance
    same = quadratic_mmd(_emb(spark, X), _emb(spark, X)).collect()[0].mmd2
    diff = quadratic_mmd(_emb(spark, X), _emb(spark, Y)).collect()[0].mmd2
    assert diff > 1000 * max(abs(same), 1e-9)


def test_mmd_matches_pairwise_reference(spark):
    rng = np.random.default_rng(9)
    X = rng.normal(size=(40, 64))
    Y = rng.normal(size=(30, 64)) + 0.5
    Xq = np.round(X * 1000)
    Yq = np.round(Y * 1000)
    kaa = ((Xq @ Xq.T) ** 2).sum() / (40 * 40)
    kbb = ((Yq @ Yq.T) ** 2).sum() / (30 * 30)
    kab = ((Xq @ Yq.T) ** 2).sum() / (40 * 30)
    ref = (kaa + kbb - 2 * kab) / 1000.0**4
    got = quadratic_mmd(_emb(spark, X), _emb(spark, Y)).collect()[0].mmd2
    assert abs(got - ref) / max(abs(ref), 1.0) < 1e-6, (got, ref)
