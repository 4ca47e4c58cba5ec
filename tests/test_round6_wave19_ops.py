"""Wave-19 round-6 operators: NDCG/MRR (operators/ranking_eval.py),
Markov removal-effect attribution (operators/markov.py)."""

from __future__ import annotations

import math

import pytest

from owl_etl_spark.operators.markov import (
    CONV,
    NULL_END,
    START,
    _absorption_micro,
    markov_removal_attribution,
    markov_transition_counts,
)
from owl_etl_spark.operators.ranking_eval import ndcg_report


# ------------------------------------------------------------------ NDCG


def _d(i):
    return round(1_000_000 / math.log2(i + 1))


def test_ndcg_perfect_and_worst_order(spark):
    # key a: both relevant items on top -> ndcg 1; key b: relevant at
    # the bottom of 4
    rows = [
        ("a", 40, 1, 1), ("a", 30, 2, 1), ("a", 20, 3, 0), ("a", 10, 4, 0),
        ("b", 40, 1, 0), ("b", 30, 2, 0), ("b", 20, 3, 0), ("b", 10, 4, 1),
    ]
    df = spark.createDataFrame(rows, ["k", "score", "id", "rel"])
    out = {r["k"]: r for r in ndcg_report(df, ["k"], "score", "id", "rel", k=10).collect()}
    assert out["a"]["ndcg"] == 1.0 and out["a"]["mrr"] == 1.0
    assert out["b"]["dcg_micro"] == _d(4)
    assert out["b"]["idcg_micro"] == _d(1)
    assert out["b"]["ndcg"] == round(_d(4) / _d(1), 6)
    assert out["b"]["mrr"] == round((1_000_000 // 4) / 1e6, 6)


def test_ndcg_no_relevant_is_null(spark):
    df = spark.createDataFrame([("a", 5, 1, 0), ("a", 4, 2, 0)], ["k", "s", "id", "rel"])
    r = ndcg_report(df, ["k"], "s", "id", "rel").collect()[0]
    assert r["ndcg"] is None and r["mrr"] is None and r["n_rel"] == 0


def test_ndcg_beyond_k_discount_zero(spark):
    # relevant item at position 11 contributes nothing at k=10
    rows = [("a", 100 - i, i, 0) for i in range(1, 11)] + [("a", 1, 11, 1)]
    df = spark.createDataFrame(rows, ["k", "s", "id", "rel"])
    r = ndcg_report(df, ["k"], "s", "id", "rel", k=10).collect()[0]
    assert r["dcg_micro"] == 0 and r["ndcg"] == 0.0
    assert r["mrr"] == 0.0  # relevant exists but beyond k


def test_ndcg_guards(spark):
    df = spark.createDataFrame([("a", 1, 1, None)], "k string, s int, id int, rel int")
    with pytest.raises(Exception, match="0/1"):
        ndcg_report(df, ["k"], "s", "id", "rel").collect()
    with pytest.raises(ValueError, match="k must"):
        ndcg_report(df, ["k"], "s", "id", "rel", k=0)


# ---------------------------------------------------------------- Markov


def test_transition_counts_shape(spark):
    # journey u1: A -> B -> conv ; u2: A -> null
    rows = [(1, "A", 1, 1), (1, "B", 2, 1), (2, "A", 1, 0)]
    df = spark.createDataFrame(rows, ["u", "ch", "t", "conv"])
    out = {(r["src"], r["dst"]): r["cnt"] for r in markov_transition_counts(
        df, "u", "ch", "t", "t", "conv").collect()}
    assert out == {
        (START, "A"): 2, ("A", "B"): 1, ("B", CONV): 1, ("A", NULL_END): 1,
    }


def test_absorption_recurrence_exact():
    # start -> A (always); A -> conv 50%, A -> null 50%
    counts = [(START, "A", 2), ("A", CONV, 1), ("A", NULL_END, 1)]
    assert _absorption_micro(counts, None, 5) == 500_000
    # removing A kills all conversion
    assert _absorption_micro(counts, "A", 5) == 0


def test_absorption_multi_hop_geometric():
    # start->A; A->B 50% / A->conv 50%; B->A always: conv prob sums the
    # geometric series 1/2 + 1/4 ... within the step budget
    counts = [
        (START, "A", 1), ("A", CONV, 1), ("A", "B", 1), ("B", "A", 1),
    ]
    # 2 steps: start->A->conv only = 0.5
    assert _absorption_micro(counts, None, 2) == 500_000
    # deep budget converges toward 1 (integer floors keep it slightly under)
    deep = _absorption_micro(counts, None, 40)
    assert 990_000 < deep <= 1_000_000


def test_markov_attribution_end_to_end(spark):
    # u1..u4: journeys where only channel A ever leads to conversion
    rows = []
    for u in (1, 2):
        rows += [(u, "A", 1, 1)]          # A -> conv
    for u in (3, 4):
        rows += [(u, "B", 1, 0)]          # B -> null
    df = spark.createDataFrame(rows, ["u", "ch", "t", "conv"])
    out = {r["channel"]: r for r in markov_removal_attribution(
        df, "u", "ch", "t", "t", "conv", max_steps=8).collect()}
    assert out["A"]["removal_effect_micro"] > 0
    assert out["B"]["removal_effect_micro"] == 0
    assert out["A"]["share_micro"] == 1_000_000
    assert out["B"]["share_micro"] == 0


def test_markov_shares_sum_to_unit(spark):
    rows = [
        (1, "A", 1, 1), (1, "B", 2, 1),
        (2, "B", 1, 1),
        (3, "A", 1, 0), (3, "C", 2, 0),
        (4, "C", 1, 1),
    ]
    df = spark.createDataFrame(rows, ["u", "ch", "t", "conv"])
    out = markov_removal_attribution(df, "u", "ch", "t", "t", "conv").collect()
    shares = [r["share_micro"] for r in out]
    assert all(s is not None for s in shares)
    assert sum(shares) == 1_000_000


def test_markov_guard():
    with pytest.raises(ValueError, match="max_steps"):
        # DataFrame never touched before the guard
        markov_removal_attribution(None, "u", "c", "t", "t", "y", max_steps=0)
