"""Round-7 wave-3 operators: Bradley-Terry MM (pairwise.py), Shapley
attribution (attribution.py), WoE/IV binning (encoding.py)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from owl_etl_spark.operators.attribution import shapley_attribution
from owl_etl_spark.operators.encoding import woe_iv_report
from owl_etl_spark.operators.pairwise import bradley_terry_strengths


# ----------------------------------------------------------- Bradley-Terry


def test_bt_orders_by_true_strength(spark):
    # round-robin with clear hierarchy: a beats b 9/10, b beats c 9/10,
    # a beats c 9/10 — fitted strengths must order a > b > c
    games = []
    games += [("a", "b")] * 9 + [("b", "a")] * 1
    games += [("b", "c")] * 9 + [("c", "b")] * 1
    games += [("a", "c")] * 9 + [("c", "a")] * 1
    df = spark.createDataFrame(games, "winner string, loser string")
    out = {r.item: r for r in bradley_terry_strengths(df, n_iters=8).collect()}
    assert out["a"].strength_micro == 1_000_000  # pivot = strongest
    assert out["a"].strength_micro > out["b"].strength_micro > out["c"].strength_micro
    assert out["a"].wins == 18 and out["a"].games == 20


def test_bt_symmetric_record_is_symmetric(spark):
    games = [("x", "y")] * 5 + [("y", "x")] * 5
    df = spark.createDataFrame(games, "winner string, loser string")
    out = {r.item: r.strength_micro for r in bradley_terry_strengths(df).collect()}
    assert out["x"] == out["y"] == 1_000_000


def test_bt_tracks_real_mm_fit(spark):
    # vs an independent float MM implementation: same data, many
    # iterations, strengths must agree to the documented ~0.2%/round
    # quantization (use a loose 2% total tolerance)
    games = (
        [("a", "b")] * 7 + [("b", "a")] * 3
        + [("b", "c")] * 6 + [("c", "b")] * 4
        + [("a", "c")] * 8 + [("c", "a")] * 2
    )
    df = spark.createDataFrame(games, "winner string, loser string")
    out = {r.item: r.strength_micro / 1e6 for r in bradley_terry_strengths(df, n_iters=12).collect()}

    items = ["a", "b", "c"]
    n = {
        ("a", "b"): 10, ("b", "a"): 10,
        ("b", "c"): 10, ("c", "b"): 10,
        ("a", "c"): 10, ("c", "a"): 10,
    }
    wins = {"a": 7 + 8, "b": 3 + 6, "c": 4 + 2}
    p = {i: 1.0 for i in items}
    for _ in range(200):
        p = {
            i: wins[i]
            / sum(n[(i, j)] / (p[i] + p[j]) for j in items if j != i)
            for i in items
        }
        mx = max(p.values())
        p = {i: v / mx for i, v in p.items()}
    for i in items:
        assert abs(out[i] - p[i]) < 0.02, (i, out[i], p[i])


def test_bt_winless_item_goes_to_zero(spark):
    games = [("a", "z")] * 4 + [("b", "z")] * 4 + [("a", "b"), ("b", "a")]
    df = spark.createDataFrame(games, "winner string, loser string")
    out = {r.item: r for r in bradley_terry_strengths(df, n_iters=6).collect()}
    assert out["z"].strength_micro == 0
    assert out["z"].wins == 0 and out["z"].games == 8


def test_bt_self_game_raises(spark):
    df = spark.createDataFrame([("a", "a")], "winner string, loser string")
    with pytest.raises(Exception, match="self-game"):
        bradley_terry_strengths(df).collect()


def test_bt_deterministic_under_repartition(spark):
    games = [("a", "b")] * 5 + [("b", "c")] * 3 + [("c", "a")] * 2
    df = spark.createDataFrame(games, "winner string, loser string")
    r1 = sorted((r.item, r.strength_micro) for r in bradley_terry_strengths(df).collect())
    r2 = sorted(
        (r.item, r.strength_micro)
        for r in bradley_terry_strengths(df.repartition(7, "loser")).collect()
    )
    assert r1 == r2


# ------------------------------------------------------------------ Shapley


def test_shapley_hand_computed(spark):
    # users: {a,b}+conv, {a}, {b,c}, {a}+conv
    t = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 1), (2, "a", 0), (3, "b", 0), (3, "c", 0), (4, "a", 1)],
        "user_id int, channel string, conv int",
    )
    out = {r.channel: r for r in shapley_attribution(t, "user_id", "channel", "conv").collect()}
    # v({a,b})=1e6, v({a})=500000, v({b,c})=0; k=3, k!=6
    assert out["a"].shapley_scaled == 2_000_000
    assert out["b"].shapley_scaled == 500_000
    assert out["c"].shapley_scaled == -2_500_000
    assert out["a"].shapley_micro == 333_333


def test_shapley_single_channel_gets_all_credit(spark):
    t = spark.createDataFrame(
        [(1, "x", 1), (2, "x", 0)], "user_id int, channel string, conv int"
    )
    out = shapley_attribution(t, "user_id", "channel", "conv").collect()
    assert len(out) == 1
    # k=1: shapley = v({x}) - v({}) = 500000 - 0
    assert out[0].shapley_micro == 500_000


def test_shapley_channel_guard_raises(spark):
    rows = [(1, f"c{i}", 0) for i in range(13)]
    t = spark.createDataFrame(rows, "user_id int, channel string, conv int")
    with pytest.raises(ValueError, match="max_channels"):
        shapley_attribution(t, "user_id", "channel", "conv")


# ------------------------------------------------------------------ WoE/IV


def test_woe_iv_hand_computed_two_bins(spark):
    # 10 rows, bin1 = values 1..5 (1 bad), bin2 = 6..10 (4 bad)
    rows = [(v, 1 if (v == 3 or v >= 7) else 0) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "v int, y int")
    out = {r.bin: r for r in woe_iv_report(df, "v", "y", n_bins=2).collect()}
    G, B = 5, 5
    woe1 = round(math.log((4 * B) / (1 * G)) * 1e6)
    woe2 = round(math.log((1 * B) / (4 * G)) * 1e6)
    assert out[1].good == 4 and out[1].n_bad == 1
    assert out[1].woe_micro == woe1
    assert out[2].woe_micro == woe2
    # iv terms: (4/5 - 1/5)*woe1/1e6 and (1/5 - 4/5)*woe2/1e6, micro
    iv1 = round((4 * 10**6 // 5 - 1 * 10**6 // 5) * woe1 / 1e6)
    assert out[1].iv_term_micro == iv1
    assert out[1].iv_term_micro > 0 and out[2].iv_term_micro > 0


def test_woe_zero_bad_bin_is_null(spark):
    rows = [(v, 1 if v > 5 else 0) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "v int, y int")
    out = {r.bin: r for r in woe_iv_report(df, "v", "y", n_bins=2).collect()}
    assert out[1].woe_micro is None and out[1].iv_term_micro is None
    assert out[2].woe_micro is None  # zero goods


def test_woe_uninformative_feature_has_tiny_iv(spark):
    # alternating target over 50-row bins: both bins hold exactly 25
    # events -> identical rates -> woe exactly 0, IV exactly 0
    rows = [(v, v % 2) for v in range(100)]
    df = spark.createDataFrame(rows, "v int, y int")
    out = woe_iv_report(df, "v", "y", n_bins=2).collect()
    assert all(r.woe_micro == 0 for r in out)
    assert sum(r.iv_term_micro for r in out) == 0


def test_woe_bins_are_equal_frequency(spark):
    rows = [(v, 0) for v in range(97)]
    df = spark.createDataFrame(rows, "v int, y int")
    out = woe_iv_report(df, "v", "y", n_bins=10).collect()
    sizes = sorted(r.n for r in out)
    assert sizes == sorted([10] * 7 + [9] * 3)
