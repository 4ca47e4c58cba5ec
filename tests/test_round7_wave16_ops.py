"""Round-7 wave-16 operators: Cramér-von Mises (wasserstein.py),
Theil index (inequality.py), geometric LTV (cohort.py)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from owl_etl_spark.operators.cohort import geometric_ltv
from owl_etl_spark.operators.inequality import theil_index
from owl_etl_spark.operators.wasserstein import cramer_von_mises_pairs


# -------------------------------------------------------------------- CvM


def _kv(spark, dists):
    rows = [(k, v) for k, vals in dists.items() for v in vals]
    return spark.createDataFrame(rows, "k string, v long")


def test_cvm_identical_zero(spark):
    vals = [1, 3, 3, 7, 9] * 10
    out = cramer_von_mises_pairs(_kv(spark, {"a": vals, "b": vals}), "k", "v").collect()
    assert out[0].cvm_micro == 0


def test_cvm_detects_body_shift_more_than_tail(spark):
    base = list(range(100))
    body = [v + 30 if 25 <= v < 75 else v for v in base]   # mid-mass shift
    tail = [v + 30 if v >= 97 else v for v in base]         # 3 tail points
    mid = cramer_von_mises_pairs(_kv(spark, {"a": base, "b": body}), "k", "v").collect()[0]
    tl = cramer_von_mises_pairs(_kv(spark, {"a": base, "b": tail}), "k", "v").collect()[0]
    assert mid.cvm_micro > 5 * tl.cvm_micro


def test_cvm_headroom_guard(spark):
    rows = [("a", 1)] * 5000 + [("b", 2)] * 5000
    df = spark.createDataFrame(rows, "k string, v long")
    with pytest.raises(Exception, match="headroom"):
        cramer_von_mises_pairs(df, "k", "v").collect()


# ------------------------------------------------------------------ Theil


def test_theil_equal_is_zero_and_concentrated_is_ln_n(spark):
    eq = [("e", 100)] * 50
    conc = [("c", 5000)] + [("c", 0)] * 49
    df = spark.createDataFrame(eq + conc, "g string, x long")
    out = {r.group: r for r in theil_index(df, "g", "x").collect()}
    assert out["e"].theil_micro_nats == 0
    assert abs(out["c"].theil_micro_nats - round(math.log(50) * 1e6)) <= 60


def test_theil_matches_float_reference(spark):
    import random

    rnd = random.Random(6)
    vals = [rnd.randrange(1, 10_000) for _ in range(500)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, x long")
    got = theil_index(df, "g", "x").collect()[0].theil_micro_nats / 1e6
    mu = sum(vals) / len(vals)
    ref = sum((x / mu) * math.log(x / mu) for x in vals) / len(vals)
    assert abs(got - ref) < 1e-3


def test_theil_negative_raises(spark):
    df = spark.createDataFrame([("g", -1)], "g string, x long")
    with pytest.raises(Exception, match="negative"):
        theil_index(df, "g", "x").collect()


# -------------------------------------------------------------------- LTV


def test_ltv_hand_computed(spark):
    # cohort 0: two users, one returns in period 1; ARPU = 175 units
    rows = [("u1", 0, 100), ("u1", 1, 50), ("u2", 0, 200)]
    df = spark.createDataFrame(rows, "u string, p long, r long")
    out = geometric_ltv(df, "u", "p", "r", horizon=12).collect()[0]
    assert out.n0 == 2 and out.returned == 1
    assert out.retention_micro == 500_000
    assert out.arpu_micro == 175 * 10**6
    # integer fold of sum r^t, r=0.5, 12 terms ~ 2.0 (quantized)
    series = 10**6
    for _ in range(11):
        series = (series * 500_000) // 10**6 + 10**6
    assert out.ltv_micro == (175 * 10**6 * series) // 10**6


def test_ltv_full_retention_is_horizon_arpu(spark):
    rows = [("u", 0, 10), ("u", 1, 10)]
    df = spark.createDataFrame(rows, "u string, p long, r long")
    out = geometric_ltv(df, "u", "p", "r", horizon=8).collect()[0]
    assert out.retention_micro == 10**6
    assert out.ltv_micro == out.arpu_micro * 8


def test_ltv_zero_retention_is_arpu(spark):
    rows = [("u1", 0, 10), ("u2", 0, 30)]
    df = spark.createDataFrame(rows, "u string, p long, r long")
    out = geometric_ltv(df, "u", "p", "r", horizon=24).collect()[0]
    assert out.retention_micro == 0
    assert out.ltv_micro == out.arpu_micro


def test_ltv_horizon_guard(spark):
    df = spark.createDataFrame([("u", 0, 1)], "u string, p long, r long")
    with pytest.raises(ValueError, match="horizon"):
        geometric_ltv(df, "u", "p", "r", horizon=0)
