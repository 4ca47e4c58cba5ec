"""Wave-15 round-6 operators: SPRT sequential test (operators/sprt.py),
haversine radius join (operators/spherical.py), l-diversity
(operators/privacy.py)."""

from __future__ import annotations

import math

import pytest

from owl_etl_spark.operators.privacy import l_diversity_report
from owl_etl_spark.operators.spherical import (
    haversine_km,
    haversine_radius_join,
)
from owl_etl_spark.operators.sprt import sprt_constants, sprt_monitor


# ------------------------------------------------------------------ SPRT


def _run_sprt(spark, obs, **kw):
    df = spark.createDataFrame(obs, ["k", "t", "tb", "y"])
    kw.setdefault("p0", 0.5)
    kw.setdefault("p1", 0.8)
    return sprt_monitor(df, ["k"], "y", "t", "tb", **kw).collect()


def test_sprt_accepts_h1_on_hot_streak(spark):
    c = sprt_constants(0.5, 0.8, 0.05, 0.2)
    need = math.ceil(c["upper"] / c["inc1"])  # successes to cross upper
    obs = [("g", i, i, 1) for i in range(need + 5)]
    r = _run_sprt(spark, obs)[0]
    assert r["decision"] == "accept_h1"
    assert r["n_at_decision"] == need
    assert r["n_pos"] == need + 5


def test_sprt_accepts_h0_on_cold_streak(spark):
    c = sprt_constants(0.5, 0.8, 0.05, 0.2)
    need = math.ceil(c["lower"] / c["inc0"])  # failures to cross lower
    obs = [("g", i, i, 0) for i in range(need + 3)]
    r = _run_sprt(spark, obs)[0]
    assert r["decision"] == "accept_h0"
    assert r["n_at_decision"] == need


def test_sprt_continue_and_exact_llr(spark):
    c = sprt_constants(0.5, 0.8, 0.05, 0.2)
    obs = [("g", 0, 0, 1), ("g", 1, 1, 0)]  # one each: no crossing
    r = _run_sprt(spark, obs)[0]
    assert r["decision"] == "continue" and r["n_at_decision"] is None
    assert r["llr_micro"] == c["inc1"] + c["inc0"]


def test_sprt_first_crossing_wins(spark):
    # walk up past upper FIRST, then dive — decision must be the
    # earliest crossing, not the final position
    c = sprt_constants(0.5, 0.8, 0.05, 0.2)
    ups = math.ceil(c["upper"] / c["inc1"])
    obs = [("g", i, i, 1) for i in range(ups)] + [
        ("g", ups + i, ups + i, 0) for i in range(100)
    ]
    r = _run_sprt(spark, obs)[0]
    assert r["decision"] == "accept_h1" and r["n_at_decision"] == ups


def test_sprt_guards(spark):
    import pyspark

    df = spark.createDataFrame([("g", 0, 0, None)], "k string, t int, tb int, y int")
    with pytest.raises(Exception, match="0/1"):
        sprt_monitor(df, ["k"], "y", "t", "tb", p0=0.5, p1=0.8).collect()
    with pytest.raises(ValueError, match="p0"):
        sprt_constants(0.5, 0.5)


# ------------------------------------------------------------- haversine


def test_haversine_known_distance(spark):
    # Paris (48.8566, 2.3522) <-> London (51.5074, -0.1278) ~ 343.5 km
    df = spark.createDataFrame(
        [(1, 48.8566, 2.3522), (2, 51.5074, -0.1278)], ["id", "lat", "lon"]
    )
    out = haversine_radius_join(df, "id", "lat", "lon", radius_km=400.0).collect()
    assert len(out) == 1
    assert abs(out[0]["dist_km"] - 343.5) < 1.0


def test_haversine_excludes_beyond_radius(spark):
    df = spark.createDataFrame(
        [(1, 48.8566, 2.3522), (2, 51.5074, -0.1278)], ["id", "lat", "lon"]
    )
    assert haversine_radius_join(df, "id", "lat", "lon", radius_km=300.0).collect() == []


def test_haversine_catches_cross_cell_neighbors_at_high_lat(spark):
    # two points 0.5 deg of LON apart at 60N: ~27.8 km ground distance;
    # a naive planar grid with lat-sized cells would probe correctly
    # only because of the cos-compensated widening
    df = spark.createDataFrame(
        [(1, 60.0, 10.0), (2, 60.0, 10.5), (3, 60.0, 14.0)], ["id", "lat", "lon"]
    )
    out = haversine_radius_join(df, "id", "lat", "lon", radius_km=30.0).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}
    d = out[0]["dist_km"]
    assert abs(d - 0.5 * 111.195 * math.cos(math.radians(60))) < 0.3


def test_haversine_zero_distance_pair(spark):
    df = spark.createDataFrame([(1, 10.0, 20.0), (2, 10.0, 20.0)], ["id", "lat", "lon"])
    out = haversine_radius_join(df, "id", "lat", "lon", radius_km=1.0).collect()
    assert len(out) == 1 and out[0]["dist_km"] == 0.0


def test_haversine_polar_guard(spark):
    df = spark.createDataFrame([(1, 80.0, 0.0), (2, 80.1, 0.0)], ["id", "lat", "lon"])
    with pytest.raises(Exception, match="blocking band"):
        haversine_radius_join(df, "id", "lat", "lon", radius_km=10.0).collect()
    with pytest.raises(ValueError, match="radius_km"):
        haversine_radius_join(df, "id", "lat", "lon", radius_km=0)


def test_haversine_km_symmetry(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(12.3, 45.6, -7.8, 100.0)], ["a1", "o1", "a2", "o2"])
    r = df.select(
        haversine_km(F.col("a1"), F.col("o1"), F.col("a2"), F.col("o2")).alias("d1"),
        haversine_km(F.col("a2"), F.col("o2"), F.col("a1"), F.col("o1")).alias("d2"),
    ).collect()[0]
    assert r["d1"] == r["d2"]


# ------------------------------------------------------------ l-diversity


def test_l_diversity_flags_low_diversity_cells(spark):
    rows = (
        [("a", 1, f"u{i}") for i in range(5)]  # 5 distinct -> safe at l=3
        + [("b", 1, "same")] * 6  # 1 distinct -> at risk
        + [("c", 1, None)] * 4  # nulls don't count -> 0 distinct, at risk
    )
    df = spark.createDataFrame(rows, ["q1", "q2", "s"])
    out = {r["q1"]: r for r in l_diversity_report(df, ["q1", "q2"], "s", l=3).collect()}
    assert out["a"]["n_sensitive"] == 5 and not out["a"]["at_risk"]
    assert out["b"]["n_sensitive"] == 1 and out["b"]["at_risk"]
    assert out["c"]["n_sensitive"] == 0 and out["c"]["at_risk"]
    assert out["c"]["n"] == 4


def test_l_diversity_l_guard(spark):
    df = spark.createDataFrame([("a", 1, "x")], ["q1", "q2", "s"])
    with pytest.raises(ValueError, match="l >= 2"):
        l_diversity_report(df, ["q1", "q2"], "s", l=1)
