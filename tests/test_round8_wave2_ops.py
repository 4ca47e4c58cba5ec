"""Round-8 wave-2 operators: boosted stumps (operators/boost.py), HBOS
(anomaly.hbos_scores), sorted-neighborhood blocking
(linkage.sorted_neighborhood_pairs), Katz centrality
(graph.katz_centrality), IRLS quantile regression
(robust.quantile_regression_fit), AIPW (experiment.aipw_report),
incremental IVF (cluster.ivf_knn_preassigned), mutual best match
(affinity.mutual_best_match).

Each operator is pinned against an independent pure-Python replica of
its exact-integer recurrence (the q233/q272 testing convention), plus
the semantic property the estimator exists for (MAE decreases,
coverage ≈ τ, planted outliers surface, incremental ≡ one-shot).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from owl_etl_spark.operators.affinity import mutual_best_match
from owl_etl_spark.operators.anomaly import hbos_scores
from owl_etl_spark.operators.boost import gbm_stump_fit
from owl_etl_spark.operators.cluster import (
    assign_clusters,
    centroids_from_ids,
    ivf_knn,
    ivf_knn_preassigned,
)
from owl_etl_spark.operators.experiment import aipw_report
from owl_etl_spark.operators.graph import katz_centrality
from owl_etl_spark.operators.linkage import sorted_neighborhood_pairs
from owl_etl_spark.operators.logreg import _round_half_away
from owl_etl_spark.operators.robust import quantile_regression_fit


# ---------------------------------------------------------------- boost

def _py_gbm(rows, thresholds, rounds):
    """Pure-Python replica of the exact boosting recurrence."""
    n = len(rows)
    base = _round_half_away(sum(y for y, _ in rows) / n)
    resid = {i: y - base for i, (y, x) in enumerate(rows)}
    out = [{"round": 0, "threshold": None, "left_leaf": base, "right_leaf": base}]
    for k in range(1, rounds + 1):
        out[-1]["mae"] = _round_half_away(sum(abs(r) for r in resid.values()) / n)
        s = sum(resid.values())
        best = None
        for t in sorted(thresholds):
            nl = sum(1 for i, (y, x) in enumerate(rows) if x <= t)
            if nl == 0 or nl == n:
                continue
            sl = sum(resid[i] for i, (y, x) in enumerate(rows) if x <= t)
            sr, nr = s - sl, n - nl
            gain = (float(sl) * float(sl)) / nl + (float(sr) * float(sr)) / nr
            if best is None or (gain, -t) > (best[0], -best[1]):
                best = (gain, t, sl, nl, sr, nr)
        _, t, sl, nl, sr, nr = best
        left, right = _round_half_away(sl / nl), _round_half_away(sr / nr)
        for i, (y, x) in enumerate(rows):
            resid[i] -= left if x <= t else right
        out.append({"round": k, "threshold": t, "left_leaf": left, "right_leaf": right})
    out[-1]["mae"] = _round_half_away(sum(abs(r) for r in resid.values()) / n)
    return out


def test_gbm_matches_python_replica(spark):
    rows = [((x % 7) * 1000 + x * 37 + (1 if x % 2 else -1) * 250, x % 50)
            for x in range(400)]
    df = spark.createDataFrame(rows, "y long, x long")
    got = gbm_stump_fit(df, "y", "x", [10, 20, 30, 40], rounds=3)
    want = _py_gbm(rows, [10, 20, 30, 40], 3)
    for g, w in zip(got, want):
        assert g["threshold"] == w["threshold"]
        assert g["left_leaf"] == w["left_leaf"]
        assert g["right_leaf"] == w["right_leaf"]
        assert g["mae"] == w["mae"]


def test_gbm_mae_non_increasing(spark):
    df = spark.range(500).select(
        (F.col("id") * 13 % 9000).alias("y"), (F.col("id") % 40).alias("x")
    )
    fit = gbm_stump_fit(df, "y", "x", [5, 10, 15, 20, 25, 30, 35], rounds=4)
    maes = [d["mae"] for d in fit]
    assert all(a >= b for a, b in zip(maes, maes[1:])), maes
    assert maes[-1] < maes[0]


def test_gbm_raises_when_nothing_splits(spark):
    df = spark.createDataFrame([(100, 5), (200, 5)], "y long, x long")
    with pytest.raises(ValueError, match="no candidate"):
        gbm_stump_fit(df, "y", "x", [50], rounds=1)


# ----------------------------------------------------------------- hbos

def test_hbos_planted_outlier_scores_highest(spark):
    # 200 rows clumped at (100..119, 0..19), one row far away in both
    rows = [(i, 100 + i % 20, i % 20) for i in range(200)] + [(999, 9999, 500)]
    df = spark.createDataFrame(rows, "id long, f0 long, f1 long")
    got = hbos_scores(df, "id", ["f0", "f1"], bins=10).collect()
    top = max(got, key=lambda r: r["hbos_micro_nats"])
    assert top["id"] == 999


def test_hbos_exact_score_small_case(spark):
    # 4 rows, 1 feature, bins=2: values 0,0,0,9 -> bins 0,0,0,1
    df = spark.createDataFrame([(1, 0), (2, 0), (3, 0), (4, 9)], "id long, v long")
    got = {r["id"]: r["hbos_micro_nats"]
           for r in hbos_scores(df, "id", ["v"], bins=2).collect()}
    assert got[1] == round(math.log(4 / 3) * 1_000_000)
    assert got[4] == round(math.log(4 / 1) * 1_000_000)


def test_hbos_all_null_feature_raises(spark):
    df = spark.createDataFrame([(1, None)], "id long, v long")
    with pytest.raises(ValueError, match="all-null"):
        hbos_scores(df, "id", ["v"])


# ------------------------------------------------------------------ snm

def test_snm_window_pairs_small_case(spark):
    rows = [(1, "alpha bravo"), (2, "alpha brayo"), (3, "alpha zulu"),
            (4, "beta one"), (5, "beta two")]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r["id_a"], r["id_b"]): r["distance"]
           for r in sorted_neighborhood_pairs(df, "id", "name", window=1).collect()}
    # block "alpha" sorted: bravo(1) < brayo(2) < zulu(3); block "beta": one(4) < two(5)
    assert set(got) == {(1, 2), (2, 3), (4, 5)}
    assert got[(1, 2)] == 1  # bravo -> brayo
    assert got[(4, 5)] == 3  # one -> two


def test_snm_window_2_adds_skip_pairs_and_min_distance(spark):
    rows = [(1, "c aa"), (2, "c ab"), (3, "c bb")]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r["id_a"], r["id_b"]) for r in
           sorted_neighborhood_pairs(df, "id", "name", window=2).collect()}
    assert got == {(1, 2), (2, 3), (1, 3)}
    # the skip pair aa->bb costs 2 edits; adjacent pairs cost 1
    few = sorted_neighborhood_pairs(df, "id", "name", window=2, max_distance=1)
    assert {(r["id_a"], r["id_b"]) for r in few.collect()} == {(1, 2), (2, 3)}


# ----------------------------------------------------------------- katz

def _py_katz(edges, nodes, iters, alpha):
    x = {n: 1_000_000 for n in nodes}
    for _ in range(iters):
        inc = {n: 0 for n in nodes}
        for s, d in edges:
            inc[d] += x[s]
        x = {n: 1_000_000 + _round_half_away(alpha * inc[n]) for n in nodes}
    return x


def test_katz_matches_python_replica(spark):
    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 2)]
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(i,) for i in range(4)], "node long")
    got = {r["node"]: r["katz_micro_units"]
           for r in katz_centrality(e, n, n_iters=5, alpha=0.25).collect()}
    assert got == _py_katz(edges, range(4), 5, 0.25)
    # node 2 has the most in-links -> highest Katz; node 3 has none -> baseline
    assert got[2] == max(got.values())
    assert got[3] == 1_000_000


# ------------------------------------------------------- quantile reg

def _py_quantreg(rows, tc, iters, delta):
    fd = lambda a, b: a // b  # operands used below are constructed nonneg-safe

    def fd_floor(a, b):
        return (a - (((a % b) + b) % b)) // b

    def solve(sw, sx, sxx, sy, sxy):
        det = float(sxx) * sw - float(sx) * sx
        slope = (float(sw) * sxy - float(sx) * sy) / det
        intercept = (float(sxx) * sy - float(sx) * sxy) / det
        return (_round_half_away(intercept * 1e6), _round_half_away(slope * 1e6))

    n = len(rows)
    w0, w1 = solve(
        n,
        sum(x for _, x in rows),
        sum(x * x for _, x in rows),
        sum(y for y, _ in rows),
        sum(x * y for y, x in rows),
    )
    for _ in range(iters):
        sw = sx = sxx = sy = sxy = 0
        for y, x in rows:
            r = y - fd_floor(w0 + w1 * x, 1_000_000)
            side = tc if r >= 0 else 100 - tc
            w = fd_floor(side * 10_000, max(abs(r), delta))
            sw += w
            sx += w * x
            sxx += w * x * x
            sy += w * y
            sxy += w * x * y
        w0, w1 = solve(sw, sx, sxx, sy, sxy)
    return w0, w1


def test_quantreg_matches_python_replica(spark):
    rows = [(100 + 7 * x + (x * x * 31) % 60, x) for x in range(1, 120)]
    df = spark.createDataFrame(rows, "y long, x long")
    fit = quantile_regression_fit(df, "y", "x", tau_centi=80, n_iters=3, delta=5)
    assert (fit["intercept_micro"], fit["slope_micro"]) == _py_quantreg(
        rows, 80, 3, 5
    )
    assert fit["n"] == len(rows)


def test_quantreg_coverage_near_tau(spark):
    # y = 10x + deterministic "noise" in [0, 99]
    rows = [(10 * x + (x * 7919) % 100, x) for x in range(1, 400)]
    df = spark.createDataFrame(rows, "y long, x long")
    fit = quantile_regression_fit(df, "y", "x", tau_centi=90, n_iters=6, delta=5)
    w0, w1 = fit["intercept_micro"], fit["slope_micro"]
    covered = sum(1 for y, x in rows if y <= (w0 + w1 * x) // 1_000_000)
    frac = covered / len(rows)
    assert 0.82 <= frac <= 0.98, frac
    # and the tau=90 line sits well above the median line
    fit50 = quantile_regression_fit(df, "y", "x", tau_centi=50, n_iters=6, delta=5)
    assert fit["intercept_micro"] > fit50["intercept_micro"]


def test_quantreg_constant_covariate_raises(spark):
    df = spark.createDataFrame([(5, 1), (9, 1)], "y long, x long")
    with pytest.raises(ValueError, match="singular"):
        quantile_regression_fit(df, "y", "x")


# ----------------------------------------------------------------- aipw

def test_aipw_recovers_known_effect(spark):
    # Confounded design: x drives BOTH treatment odds and outcome.
    # true effect = +500 units. naive diff is biased upward because
    # high-x rows are more often treated AND have higher outcomes.
    rows = []
    for i in range(2000):
        x = i % 100
        t = 1 if (x * 13 + i * 7) % 100 < 20 + x // 2 else 0
        y = 10 * x + 500 * t + (i * 37) % 50
        rows.append((t, y, x))
    df = spark.createDataFrame(rows, "t long, y long, x long")
    got = aipw_report(df, "t", "y", "x", prop_iterations=8).collect()[0]
    ate = got["ate_micro_units"] / 1e6
    naive = got["naive_diff_micro_units"] / 1e6
    assert abs(ate - 500) < 60, ate
    assert naive - 500 > 100, naive  # confounding visibly inflates naive
    assert got["n"] == 2000 and got["n_treat"] == sum(r[0] for r in rows)


def test_aipw_empty_arm_raises(spark):
    df = spark.createDataFrame([(0, 10, 1), (0, 12, 2)], "t long, y long, x long")
    with pytest.raises(ValueError, match="arm is empty|unidentified"):
        aipw_report(df, "t", "y", "x", prop_iterations=2)


# ------------------------------------------------- incremental ivf

def test_preassigned_equals_one_shot(spark):
    em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = centroids_from_ids(em, [0, 60, 120, 180])
    q = em.filter(F.col("vec_id") < 5)
    one = ivf_knn(q, em, cents, k=4, n_probes=2, round_digits=6)
    pre = ivf_knn_preassigned(
        q, assign_clusters(em, cents, round_digits=6), cents,
        k=4, n_probes=2, round_digits=6,
    )
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, pre.collect()))


def test_incremental_union_index_equals_full(spark):
    em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = centroids_from_ids(em, [0, 60, 120, 180])
    q = em.filter(F.col("vec_id") < 5)
    full = ivf_knn_preassigned(
        q, assign_clusters(em, cents, round_digits=6), cents,
        k=4, n_probes=2, round_digits=6,
    )
    inc_index = assign_clusters(
        em.filter(F.col("vec_id") % 3 != 0), cents, round_digits=6
    ).unionByName(
        assign_clusters(em.filter(F.col("vec_id") % 3 == 0), cents, round_digits=6)
    )
    inc = ivf_knn_preassigned(q, inc_index, cents, k=4, n_probes=2, round_digits=6)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, inc.collect()))


# -------------------------------------------------- mutual best match

def test_mutual_best_match_small_case(spark):
    rows = [
        # c1's best is s1 (30) and s1's best is c1 -> kept
        (1, 1, 30), (1, 2, 10),
        # c2's best is s1 (20) but s1 prefers c1 -> dropped
        (2, 1, 20),
        # c3 <-> s2 mutual (25 > c1's 10 on s2) -> kept
        (3, 2, 25),
    ]
    df = spark.createDataFrame(rows, "c long, s long, w long")
    got = sorted(map(tuple, mutual_best_match(df, "c", "s", "w").collect()))
    assert got == [(1, 1, 30), (3, 2, 25)]


def test_mutual_best_match_ties_break_to_smallest_partner(spark):
    rows = [(1, 7, 10), (1, 8, 10), (2, 8, 10)]
    df = spark.createDataFrame(rows, "c long, s long, w long")
    got = sorted(map(tuple, mutual_best_match(df, "c", "s", "w").collect()))
    # c1 ties s7/s8 -> picks s7; s7's only suitor is c1 -> mutual.
    # s8 ties c1/c2 -> picks c1, but c1 picked s7 -> no link for s8.
    assert got == [(1, 7, 10)]


def test_mutual_best_match_sums_weights(spark):
    rows = [(1, 7, 5), (1, 7, 6), (1, 8, 10)]
    df = spark.createDataFrame(rows, "c long, s long, w long")
    got = sorted(map(tuple, mutual_best_match(df, "c", "s", "w").collect()))
    assert got == [(1, 7, 11)]  # 5+6 beats 10 after aggregation
