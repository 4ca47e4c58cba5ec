"""Wave-16 round-6 operators: TextRank (operators/textrank.py),
c-TF-IDF (operators/termstats.py), Brier decomposition
(operators/evalmetrics.py)."""

from __future__ import annotations

import math

import pytest

from owl_etl_spark.operators.evalmetrics import brier_decomposition
from owl_etl_spark.operators.termstats import ctfidf_terms
from owl_etl_spark.operators.textrank import textrank_keywords


# -------------------------------------------------------------- TextRank


def _py_textrank(docs, iterations):
    """Independent reference: same integer recurrence per doc."""
    out = {}
    for doc_id, text in docs:
        toks = text.lower().split()
        pairs = set()
        for i in range(len(toks)):
            for d in (1, 2):
                if i + d < len(toks) and toks[i] != toks[i + d]:
                    pairs.add(tuple(sorted((toks[i], toks[i + d]))))
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        s = {w: 1_000_000 for w in adj}
        for _ in range(iterations):
            incoming = {w: 0 for w in adj}
            for w in adj:
                give = s[w] // len(adj[w])
                for nb in adj[w]:
                    incoming[nb] += give
            s = {w: 150_000 + (85 * incoming[w]) // 100 for w in adj}
        out[doc_id] = s
    return out


def test_textrank_matches_reference_and_ranks_hub(spark):
    docs = [
        (1, "spark engine spark plan engine spark catalyst plan"),
        (2, "a b c d e"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = textrank_keywords(df, "doc_id", "text", iterations=3, top_k=10).collect()
    ref = _py_textrank(docs, 3)
    for r in got:
        assert r["score_micro"] == ref[r["doc_id"]][r["token"]], r
    # rank-1 token must be the reference argmax under the declared
    # (score DESC, token ASC) total order
    top1 = [r for r in got if r["doc_id"] == 1 and r["rank"] == 1][0]
    best = min(ref[1].items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert top1["token"] == best


def test_textrank_topk_and_tiebreak(spark):
    # symmetric 3-cycle: all equal scores -> rank by token asc
    df = spark.createDataFrame([(1, "x y z x y z x")], ["doc_id", "text"])
    got = textrank_keywords(df, "doc_id", "text", iterations=2, top_k=2).collect()
    assert [r["token"] for r in sorted(got, key=lambda r: r["rank"])] == ["x", "y"]


def test_textrank_empty_graph_no_rows(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "")], ["doc_id", "text"])
    assert textrank_keywords(df, "doc_id", "text").collect() == []


def test_textrank_guards(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="iterations"):
        textrank_keywords(df, "doc_id", "text", iterations=0)


# --------------------------------------------------------------- c-TF-IDF


def test_ctfidf_scores_exact(spark):
    # classes: A has "dog" x4 + shared "the" x6; B has "cat" x4 + "the" x8
    counts = spark.createDataFrame(
        [("A", "dog", 4), ("A", "the", 6), ("B", "cat", 4), ("B", "the", 8)],
        ["g", "t", "c"],
    )
    out = {(r["g"], r["t"]): r for r in ctfidf_terms(counts, "g", "t", "c", top_k=5).collect()}
    A = (4 + 6 + 4 + 8) / 2  # avg class mass = 11
    def idf(ft):
        return round(math.log(1.0 + A / ft) * 1e6)
    assert out[("A", "dog")]["score_micro"] == 4 * idf(4)
    assert out[("A", "the")]["score_micro"] == 6 * idf(14)
    assert out[("B", "cat")]["score_micro"] == 4 * idf(4)
    # class-specific terms outrank the shared stopword
    assert out[("A", "dog")]["rank"] == 1
    assert out[("B", "cat")]["rank"] == 1


def test_ctfidf_topk_filter(spark):
    counts = spark.createDataFrame(
        [("A", f"t{i}", i + 1) for i in range(10)], ["g", "t", "c"]
    )
    out = ctfidf_terms(counts, "g", "t", "c", top_k=3).collect()
    assert len(out) == 3
    with pytest.raises(ValueError, match="top_k"):
        ctfidf_terms(counts, "g", "t", "c", top_k=0)


# ------------------------------------------------------ Brier decomposition


def test_brier_perfect_forecast(spark):
    rows = [(1_000_000, 1)] * 5 + [(0, 0)] * 5
    df = spark.createDataFrame(rows, ["p", "y"])
    r = brier_decomposition(df, "p", "y").collect()[0]
    assert r["brier_micro"] == 0
    assert r["reliability_micro"] == 0
    # resolution equals uncertainty for a perfect sharp forecast
    assert r["resolution_micro"] == r["uncertainty_micro"] == 250_000


def test_brier_constant_base_rate_forecast(spark):
    # always predict 0.5, outcomes 50/50: brier = 0.25, rel = 0, res = 0
    rows = [(500_000, 1)] * 4 + [(500_000, 0)] * 4
    df = spark.createDataFrame(rows, ["p", "y"])
    r = brier_decomposition(df, "p", "y").collect()[0]
    assert r["brier_micro"] == 250_000
    assert r["reliability_micro"] == 0
    assert r["resolution_micro"] == 0
    assert r["uncertainty_micro"] == 250_000


def test_brier_identity_holds_for_homogeneous_bins(spark):
    # two sharp bins -> brier == rel - res + unc exactly
    rows = [(900_000, 1)] * 8 + [(900_000, 0)] * 2 + [(100_000, 0)] * 9 + [(100_000, 1)]
    df = spark.createDataFrame(rows, ["p", "y"])
    r = brier_decomposition(df, "p", "y").collect()[0]
    lhs = r["brier_micro"]
    rhs = r["reliability_micro"] - r["resolution_micro"] + r["uncertainty_micro"]
    assert abs(lhs - rhs) <= 2  # micro rounding only


def test_brier_guards(spark):
    df = spark.createDataFrame([(2_000_000, 1)], ["p", "y"])
    with pytest.raises(Exception, match="prob_micro"):
        brier_decomposition(df, "p", "y").collect()
    with pytest.raises(ValueError, match="n_bins"):
        brier_decomposition(df, "p", "y", n_bins=1)
