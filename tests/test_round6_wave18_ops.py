"""Wave-18 round-6 operators: Naive Bayes (operators/nbayes.py),
diff-in-diff + CUPED (operators/experiment.py)."""

from __future__ import annotations

import math

import pytest

from owl_etl_spark.operators.experiment import cuped_report, did_report
from owl_etl_spark.operators.nbayes import nb_train_predict


# ------------------------------------------------------------ Naive Bayes


def test_nb_separable_classes_and_exact_scores(spark):
    docs = [
        (1, "dog dog bark", "pet"),
        (2, "dog bark bark", "pet"),
        (3, "stock market cash", "fin"),
        (4, "market cash cash", "fin"),
        (5, "dog bark", "pet"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
    out = {r["doc_id"]: r for r in nb_train_predict(df, "doc_id", "text", "lang").collect()}
    assert all(out[i]["correct"] for i in range(1, 6))
    # hand-verify doc 5's winning score: classes pet(3 docs), fin(2)
    # pet: mass=8 over {dog:4, bark:4}; V=5
    pr_pet = round(math.log(3 / 5) * 1e6)
    w_dog = round(math.log((4 + 1) / (8 + 5)) * 1e6)
    w_bark = round(math.log((4 + 1) / (8 + 5)) * 1e6)
    assert out[5]["score_micro"] == pr_pet + w_dog + w_bark
    assert out[5]["predicted"] == "pet"


def test_nb_unseen_token_grid_matters(spark):
    # doc 3 contains "cash" never seen in class A: the smoothed
    # unseen weight must still be counted for class A
    docs = [
        (1, "x x x", "A"),
        (2, "cash cash cash cash", "B"),
        (3, "x cash", "A"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
    out = {r["doc_id"]: r for r in nb_train_predict(df, "doc_id", "text", "lang").collect()}
    # A: docs{1,3} mass {x:4, cash:1}; B: mass {cash:4}; V=2
    sc_a = round(math.log(2 / 3) * 1e6) + round(math.log(5 / 7) * 1e6) + round(
        math.log(2 / 7) * 1e6
    )
    sc_b = round(math.log(1 / 3) * 1e6) + round(math.log(1 / 6) * 1e6) + round(
        math.log(5 / 6) * 1e6
    )
    assert out[3]["score_micro"] == max(sc_a, sc_b)
    assert out[3]["predicted"] == ("A" if sc_a >= sc_b else "B")


def test_nb_null_label_raises(spark):
    df = spark.createDataFrame([(1, "a", None)], "doc_id int, text string, lang string")
    with pytest.raises(Exception, match="NULL"):
        nb_train_predict(df, "doc_id", "text", "lang").collect()


# ------------------------------------------------------------------- DiD


def test_did_hand_case(spark):
    # control: 10 -> 12 (+2); treated: 20 -> 27 (+7); DiD = +5
    rows = (
        [(0, 0, 10)] * 3 + [(0, 1, 12)] * 3 + [(1, 0, 20)] * 2 + [(1, 1, 27)] * 2
    )
    df = spark.createDataFrame(rows, ["g", "p", "v"])
    r = did_report(df, "g", "p", "v").collect()[0]
    assert (r["n_c0"], r["n_c1"], r["n_t0"], r["n_t1"]) == (3, 3, 2, 2)
    assert r["mean_t1"] == 27.0 and r["mean_c0"] == 10.0
    assert r["did"] == 5.0


def test_did_empty_cell_null(spark):
    rows = [(0, 0, 10), (0, 1, 12), (1, 1, 20)]  # no treated-pre cell
    df = spark.createDataFrame(rows, ["g", "p", "v"])
    r = did_report(df, "g", "p", "v").collect()[0]
    assert r["did"] is None and r["mean_t0"] is None


def test_did_guard(spark):
    df = spark.createDataFrame([(2, 0, 1)], ["g", "p", "v"])
    with pytest.raises(Exception, match="0/1"):
        did_report(df, "g", "p", "v").collect()


# ------------------------------------------------------------------ CUPED


def test_cuped_perfect_covariate(spark):
    # Y = 2X exactly: rho^2 = 1 -> var_adj 0, reduction 100
    rows = [(x, 2 * x) for x in (1, 3, 7, 9, 4)]
    df = spark.createDataFrame(rows, ["x", "y"])
    r = cuped_report(df, "x", "y").collect()[0]
    assert r["theta"] == 2.0
    assert r["var_adj"] == 0.0
    assert r["var_reduction_pct"] == 100.0


def test_cuped_useless_covariate(spark):
    # X constant -> theta null, var_y still reported
    rows = [(5, y) for y in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, ["x", "y"])
    r = cuped_report(df, "x", "y").collect()[0]
    assert r["theta"] is None and r["var_adj"] is None
    assert r["var_y"] == 1.25  # population variance of 1..4


def test_cuped_moments_exact(spark):
    rows = [(1, 4), (2, 5), (3, 7), (4, 10)]
    df = spark.createDataFrame(rows, ["x", "y"])
    r = cuped_report(df, "x", "y").collect()[0]
    n = 4
    xs, ys = [1, 2, 3, 4], [4, 5, 7, 10]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    cxy, cxx, cyy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    assert r["theta"] == round(cxy / cxx, 6)
    assert r["var_y"] == round(cyy / n / n, 6)
    assert r["var_reduction_pct"] == round(cxy * cxy / (cxx * cyy) * 100, 6)
