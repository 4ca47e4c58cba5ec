"""Wave-11 round-6 operators: OLS regression (operators/correlation.py),
Adamic-Adar link prediction (operators/graph.py), leave-one-out target
encoding (operators/encoding.py), seasonal-naive backtest
(operators/forecast.py), inter-arrival burstiness
(operators/activity.py), Kaplan-Meier survival (operators/survival.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from owl_etl_spark.operators.activity import interarrival_report
from owl_etl_spark.operators.correlation import ols_report
from owl_etl_spark.operators.encoding import loo_target_encode
from owl_etl_spark.operators.forecast import seasonal_naive_backtest
from owl_etl_spark.operators.graph import adamic_adar_topk
from owl_etl_spark.operators.survival import km_survival


# ------------------------------------------------------------------ OLS


def test_ols_exact_line(spark):
    # y = 2x + 1 exactly -> slope 2, intercept 1, r2 1
    df = spark.createDataFrame([("g", x, 2 * x + 1) for x in range(1, 8)], ["g", "x", "y"])
    r = ols_report(df, ["g"], "x", "y").collect()[0]
    assert r["n"] == 7
    assert r["slope"] == 2.0
    assert r["intercept"] == 1.0
    assert r["r2"] == 1.0


def test_ols_constant_x_yields_nulls(spark):
    df = spark.createDataFrame([("g", 5, y) for y in (1, 2, 3)], ["g", "x", "y"])
    r = ols_report(df, ["g"], "x", "y").collect()[0]
    assert r["slope"] is None and r["intercept"] is None and r["r2"] is None


def test_ols_null_rows_excluded_and_known_fit(spark):
    # (0,1),(1,3),(2,4): slope 1.5, intercept 7/6, r2 = 27/28
    rows = [("g", 0, 1), ("g", 1, 3), ("g", 2, 4), ("g", None, 99), ("g", 7, None)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    r = ols_report(df, ["g"], "x", "y").collect()[0]
    assert r["n"] == 3
    assert r["slope"] == 1.5
    assert r["intercept"] == round(7 / 6, 6)
    assert r["r2"] == round(27 / 28, 6)


def test_ols_group_size_guard(spark):
    df = spark.createDataFrame([("g", i, i) for i in range(30)], ["g", "x", "y"])
    with pytest.raises(Exception, match="max_group_rows"):
        ols_report(df, ["g"], "x", "y", max_group_rows=10).collect()


# ----------------------------------------------------------- Adamic-Adar


def _aa(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return adamic_adar_topk(df, "src", "dst", **kw).collect()


def test_aa_scores_and_existing_edges_excluded(spark):
    # path 1-2-3 plus 2-4: N(1)={2}, N(3)={2}, N(4)={2}; deg(2)=3.
    # Non-adjacent pairs (1,3),(1,4),(3,4) each share {2}:
    # score = floor(1e6/ln(3)).
    rows = _aa(spark, [(1, 2), (2, 3), (2, 4)], k=10)
    w = math.floor(1_000_000 / math.log(3))
    got = {(r["a"], r["b"]): (r["n_common"], r["aa_score_micro"]) for r in rows}
    assert got == {(1, 3): (1, w), (1, 4): (1, w), (3, 4): (1, w)}


def test_aa_two_common_neighbors_rank_first(spark):
    # 1 and 2 share centers 3 (deg 2) and 4 (deg 3); 5 hangs off 4.
    edges = [(1, 3), (2, 3), (1, 4), (2, 4), (5, 4)]
    rows = _aa(spark, edges, k=10)
    got = {(r["a"], r["b"]): (r["n_common"], r["aa_score_micro"]) for r in rows}
    # (3,4) shares the two deg-2 centers {1,2} -> 2*floor(1e6/ln2),
    # which outranks (1,2)'s mixed centers {3 (deg 2), 4 (deg 3)}
    assert got[(3, 4)] == (2, 2 * math.floor(1e6 / math.log(2)))
    assert got[(1, 2)] == (
        2,
        math.floor(1e6 / math.log(2)) + math.floor(1e6 / math.log(3)),
    )
    assert (rows[0]["a"], rows[0]["b"]) == (3, 4)


def test_aa_hub_cap_excludes_hub_centers(spark):
    # star center 9 with 5 leaves; hub_cap=4 < deg(9)=5 -> no wedges
    edges = [(9, i) for i in range(1, 6)]
    assert _aa(spark, edges, k=10, hub_cap=4) == []


def test_aa_min_common_filter(spark):
    rows = _aa(spark, [(1, 2), (2, 3), (2, 4)], k=10, min_common=2)
    assert rows == []


# ------------------------------------------------------ target encoding


def test_loo_means(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 7)],
        ["id", "cat", "y"],
    )
    out = {r["id"]: r["loo_mean"] for r in loo_target_encode(df, ["cat"], "y").collect()}
    assert out[1] == 25.0  # (20+30)/2
    assert out[2] == 20.0  # (10+30)/2
    assert out[3] == 15.0  # (10+20)/2
    assert out[4] is None  # singleton cell


def test_loo_null_target_raises(spark):
    df = spark.createDataFrame([(1, "a", 10), (2, "a", None)], ["id", "cat", "y"])
    with pytest.raises(Exception, match="NULL"):
        loo_target_encode(df, ["cat"], "y").collect()


# ------------------------------------------------------ seasonal naive


def test_seasonal_naive_alignment_and_metrics(spark):
    # season=2: actual(p) vs actual(p-2); periods 1..5, values 10,20,13,26,15
    # matches: p3 (13 vs 10), p4 (26 vs 20), p5 (15 vs 13)
    df = spark.createDataFrame(
        [("k", 1, 10), ("k", 2, 20), ("k", 3, 13), ("k", 4, 26), ("k", 5, 15)],
        ["k", "p", "v"],
    )
    r = seasonal_naive_backtest(df, ["k"], "p", "v", season=2).collect()[0]
    assert r["n"] == 3
    assert r["mae"] == round((3 + 6 + 2) / 3, 6)
    assert r["bias"] == round((3 + 6 + 2) / 3, 6)
    sm = (
        2_000_000 * 3 // 23 + 2_000_000 * 6 // 46 + 2_000_000 * 2 // 28
    )
    assert r["smape"] == round(sm / 3 / 1_000_000, 6)


def test_seasonal_naive_gap_means_no_match(spark):
    # period 4 exists but 4-2=2 is MISSING -> only p3 scores
    df = spark.createDataFrame(
        [("k", 1, 10), ("k", 3, 13), ("k", 4, 26)], ["k", "p", "v"]
    )
    r = seasonal_naive_backtest(df, ["k"], "p", "v", season=2).collect()
    assert len(r) == 1 and r[0]["n"] == 1 and r[0]["mae"] == 3.0


def test_seasonal_naive_null_raises(spark):
    df = spark.createDataFrame([("k", 1, None)], "k string, p int, v int")
    with pytest.raises(Exception, match="NULL"):
        seasonal_naive_backtest(df, ["k"], "p", "v", season=1).collect()


# -------------------------------------------------------- inter-arrival


def test_interarrival_metronome(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [(1, i, base + dt.timedelta(seconds=10 * i)) for i in range(6)]
    df = spark.createDataFrame(rows, ["u", "eid", "ts"])
    r = interarrival_report(df, ["u"], "ts", "eid", min_events=3).collect()[0]
    assert r["n_gaps"] == 5
    assert r["mean_gap_s"] == 10.0
    assert r["cv"] == 0.0
    assert r["burstiness"] == -1.0


def test_interarrival_min_events_filter(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [(1, i, base + dt.timedelta(seconds=i)) for i in range(2)]
    df = spark.createDataFrame(rows, ["u", "eid", "ts"])
    assert interarrival_report(df, ["u"], "ts", "eid", min_events=3).collect() == []


def test_interarrival_bursty_above_poisson(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # gaps: 1,1,1,1,3600 -> heavy batching, burstiness > 0
    offs = [0, 1, 2, 3, 4, 3604]
    df = spark.createDataFrame(
        [(1, i, base + dt.timedelta(seconds=o)) for i, o in enumerate(offs)],
        ["u", "eid", "ts"],
    )
    r = interarrival_report(df, ["u"], "ts", "eid").collect()[0]
    # gaps 1,1,1,1,3600: σ≈1439.7, μ=720.8 -> B≈0.333, well above Poisson's 0
    assert r["burstiness"] > 0.3


# ----------------------------------------------------------- KM survival


def test_km_survival_classic(spark):
    # durations/events: (1,1),(2,1),(2,0),(3,1)
    df = spark.createDataFrame([(1, 1), (2, 1), (2, 0), (3, 1)], ["d", "e"])
    rows = {r["t"]: r for r in km_survival(df, "d", "e").collect()}
    assert rows[1]["n_risk"] == 4 and rows[1]["n_events"] == 1
    assert rows[2]["n_risk"] == 3 and rows[2]["n_censored"] == 1
    assert rows[3]["n_risk"] == 1

    def terms(pairs):
        return sum(math.floor(1e6 * math.log((n - d) / n)) for n, d in pairs)

    l1 = terms([(4, 1)])
    l2 = terms([(4, 1), (3, 1)])
    assert rows[1]["logsurv_micro"] == l1
    assert rows[1]["km_survival"] == round(math.exp(l1 / 1e6), 6)
    assert rows[2]["logsurv_micro"] == l2
    assert rows[2]["km_survival"] == round(math.exp(l2 / 1e6), 6)
    # t=3: everyone remaining exits -> extinction
    assert rows[3]["logsurv_micro"] is None
    assert rows[3]["km_survival"] == 0.0
    # and the curve tracks the true KM product closely
    assert abs(rows[2]["km_survival"] - 0.75 * (2 / 3)) < 1e-4


def test_km_survival_keyed_and_monotone(spark):
    rows = [("g1", d, e) for d, e in [(1, 1), (2, 0), (5, 1), (5, 1), (7, 0)]] + [
        ("g2", d, 1) for d in (1, 1, 2)
    ]
    df = spark.createDataFrame(rows, ["g", "d", "e"])
    out = km_survival(df, "d", "e", keys=["g"]).collect()
    by_g = {}
    for r in sorted(out, key=lambda r: (r["g"], r["t"])):
        by_g.setdefault(r["g"], []).append(r["km_survival"])
    for g, curve in by_g.items():
        assert all(a >= b for a, b in zip(curve, curve[1:])), (g, curve)
    assert by_g["g2"][-1] == 0.0
