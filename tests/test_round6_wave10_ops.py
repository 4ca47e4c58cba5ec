"""Wave-10 round-6 operators: time-decay attribution
(operators/attribution.py), clamped running balance
(operators/window_stats.py), business-day arithmetic
(functions/dates.py)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from owl_etl_spark.functions.dates import business_days_between
from owl_etl_spark.operators.attribution import time_decay_attribution
from owl_etl_spark.operators.window_stats import clamped_running_balance


# ----------------------------------------------------- decay attribution


def _run_decay(spark, touches, convs, **kw):
    t = spark.createDataFrame(touches, ["u", "tid", "ts"])
    c = spark.createDataFrame(convs, ["u", "cid", "ts", "v"])
    return time_decay_attribution(
        t, c, key_col="u", touch_id_col="tid", touch_ts_col="ts",
        conv_id_col="cid", conv_ts_col="ts", value_col="v", **kw
    ).collect()


def test_decay_weights_and_conservation(spark):
    # epoch-second timestamps; half-life 10s: touches at Δt 5s and
    # 15s get weights 1e6 and 5e5 → 2:1 split of 99 cents = 66/33
    rows = _run_decay(
        spark,
        [(1, "t1", 95), (1, "t2", 85)],
        [(1, "c1", 100, 99)],
        lookback_seconds=60,
        half_life_seconds=10,
    )
    got = {r["touch_id"]: r["attributed_value"] for r in rows}
    assert got == {"t1": 66, "t2": 33}
    assert sum(got.values()) == 99


def test_decay_remainder_goes_to_highest_remainder(spark):
    # equal Δt bucket → equal weights → v=5 over 2 touches: floor 2
    # each, +1 to the earlier (tie on remainder → time order)
    rows = _run_decay(
        spark,
        [(1, "t1", 98), (1, "t2", 99)],
        [(1, "c1", 100, 5)],
        lookback_seconds=60,
        half_life_seconds=10,
    )
    got = {r["touch_id"]: r["attributed_value"] for r in rows}
    assert got == {"t1": 3, "t2": 2}


def test_decay_conservation_property(spark):
    rnd = random.Random(11)
    touches = [(1, f"t{i}", rnd.randint(0, 500)) for i in range(40)]
    convs = [(1, f"c{j}", rnd.randint(100, 600), rnd.randint(1, 9999)) for j in range(15)]
    t = spark.createDataFrame(touches, ["u", "tid", "ts"])
    c = spark.createDataFrame(convs, ["u", "cid", "ts", "v"])
    out = time_decay_attribution(
        t, c, "u", "tid", "ts", "cid", "ts", "v",
        lookback_seconds=200, half_life_seconds=37,
    )
    total = out.agg(F.sum("attributed_value")).collect()[0][0] or 0
    # Σ credits must equal Σ v over conversions WITH >= 1 match
    matched_v = 0
    for _, cid, cts, v in convs:
        if any(cts - 200 <= tts < cts for _, _, tts in touches):
            matched_v += v
    assert total == matched_v


# -------------------------------------------------------------- balance


def test_balance_floor_and_forfeit(spark):
    df = spark.createDataFrame(
        [("u", 1, 3), ("u", 2, -5), ("u", 3, 4), ("u", 4, -1)], ["k", "t", "d"]
    )
    got = {r["t"]: r["balance"] for r in clamped_running_balance(df, ["k"], "t", "d").collect()}
    assert got == {1: 3, 2: 0, 3: 4, 4: 3}  # hand recurrence


def test_balance_matches_sequential_reference(spark):
    rnd = random.Random(5)
    deltas = [rnd.randint(-50, 50) for _ in range(200)]
    df = spark.createDataFrame([("u", i, d) for i, d in enumerate(deltas)], ["k", "t", "d"])
    got = {r["t"]: r["balance"] for r in clamped_running_balance(df, ["k"], "t", "d").collect()}
    b = 0
    for i, d in enumerate(deltas):
        b = max(0, b + d)
        assert got[i] == b


def test_balance_nonzero_floor_and_null_raises(spark):
    df = spark.createDataFrame([("u", 1, -100), ("u", 2, 30)], ["k", "t", "d"])
    got = {r["t"]: r["balance"] for r in clamped_running_balance(df, ["k"], "t", "d", floor=10).collect()}
    assert got == {1: 10, 2: 40}
    bad = spark.createDataFrame([("u", 1, None)], "k string, t int, d int")
    with pytest.raises(Exception, match="null delta"):
        clamped_running_balance(bad, ["k"], "t", "d").collect()


# ------------------------------------------------------------- busdays


def _brute_bd(a, b):
    if a > b:
        return -_brute_bd(b, a)
    n, d = 0, a
    while d < b:
        if d.weekday() < 5:
            n += 1
        d += dt.timedelta(days=1)
    return n


def test_business_days_brute_force_parity(spark):
    rnd = random.Random(3)
    base = dt.date(1969, 6, 1)  # spans pre-1970 negatives
    cases = [
        (
            base + dt.timedelta(days=rnd.randint(0, 400)),
            base + dt.timedelta(days=rnd.randint(0, 400)),
        )
        for _ in range(80)
    ]
    df = spark.createDataFrame(cases, ["a", "b"]).select(
        "a", "b", business_days_between(F.col("a"), F.col("b")).alias("bd")
    )
    for r in df.collect():
        assert r["bd"] == _brute_bd(r["a"], r["b"]), (r["a"], r["b"])


def test_business_days_known_values(spark):
    cases = {
        # Mon 2024-01-01 .. Mon 2024-01-08 exclusive → 5 weekdays
        (dt.date(2024, 1, 1), dt.date(2024, 1, 8)): 5,
        # Sat..Mon (exclusive) → 0
        (dt.date(2024, 1, 6), dt.date(2024, 1, 8)): 0,
        # same day → 0; reversed week → -5
        (dt.date(2024, 1, 3), dt.date(2024, 1, 3)): 0,
        (dt.date(2024, 1, 8), dt.date(2024, 1, 1)): -5,
    }
    df = spark.createDataFrame(list(cases), ["a", "b"]).select(
        "a", "b", business_days_between(F.col("a"), F.col("b")).alias("bd")
    )
    for r in df.collect():
        assert r["bd"] == cases[(r["a"], r["b"])]
