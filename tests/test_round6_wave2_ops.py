"""Round-6 second-wave operator families: rolling distinct actives,
binary eval metrics (exact AUC), largest-remainder pro-rata
allocation, k-core peeling, grid radius join, distinctive terms.
Gate queries q173+ pin oracle parity; these pin library contracts
(conservation, tie handling, error paths, bounded fan-out).
"""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# rolling_distinct_actives
# ---------------------------------------------------------------------------


def test_rolling_actives_hand_case(spark):
    from owl_etl_spark.operators.activity import rolling_distinct_actives

    # u1 active day0, day2; u2 active day1; window=2
    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 11:00:00"),  # same user+day dedupes
        (1, "2024-01-03 09:00:00"),
        (2, "2024-01-02 08:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {r.day: r.active_users for r in rolling_distinct_actives(df, "user_id", "ts", 2).collect()}
    # report days = observed days only (01, 02, 03)
    assert out == {"2024-01-01": 1, "2024-01-02": 2, "2024-01-03": 2}


def test_rolling_actives_window_one_is_dau(spark):
    from owl_etl_spark.operators.activity import rolling_distinct_actives

    rows = [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 11:00:00"), (1, "2024-01-02 09:00:00")]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {r.day: r.active_users for r in rolling_distinct_actives(df, "user_id", "ts", 1).collect()}
    assert out == {"2024-01-01": 2, "2024-01-02": 1}
    with pytest.raises(ValueError):
        rolling_distinct_actives(df, "user_id", "ts", 0)


# ---------------------------------------------------------------------------
# binary_eval_report
# ---------------------------------------------------------------------------


def test_binary_eval_exact_auc_no_ties(spark):
    from owl_etl_spark.operators.evalmetrics import binary_eval_report

    # scores: neg 1,2  pos 3,4 -> perfect separation, AUC = 1
    rows = [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    r = binary_eval_report(df, "s", "y", threshold=2.5).collect()[0]
    assert r.auc == 1.0 and r.n_pos == 2 and r.n_neg == 2
    assert (r.tp, r.fp, r.tn, r.fn) == (2, 0, 2, 0)
    assert r.prec == 1.0 and r.rec == 1.0 and r.f1 == 1.0 and r.acc == 1.0


def test_binary_eval_tie_handling(spark):
    from owl_etl_spark.operators.evalmetrics import binary_eval_report

    # one pos and one neg share score 2: that pair contributes 0.5
    # U pairs: pos2 vs neg1 (win), pos2 vs neg2 (tie 0.5),
    #          pos3 vs both negs (2 wins) -> U = 3.5, AUC = 3.5/4
    rows = [(1.0, 0), (2.0, 0), (2.0, 1), (3.0, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    r = binary_eval_report(df, "s", "y", threshold=10.0).collect()[0]
    assert r.auc == pytest.approx(0.875)
    # nothing predicted positive: tp=fp=0, prec null, rec 0
    assert (r.tp, r.fp) == (0, 0) and r.prec is None and r.rec == 0.0


def test_binary_eval_null_rows_excluded_and_degenerate_auc_null(spark):
    from owl_etl_spark.operators.evalmetrics import binary_eval_report

    rows = [(1.0, 1), (None, 0), (2.0, None), (3.0, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    r = binary_eval_report(df, "s", "y", threshold=0.0).collect()[0]
    # only the two labeled-positive scored rows survive -> n_neg=0 -> auc null
    assert r.n_pos == 2 and r.n_neg == 0 and r.auc is None


# ---------------------------------------------------------------------------
# largest_remainder_allocate
# ---------------------------------------------------------------------------


def test_prorata_conserves_and_ranks_remainders(spark):
    from owl_etl_spark.operators.prorate import largest_remainder_allocate

    df = spark.createDataFrame([("a", 10), ("b", 20), ("c", 5)], "k string, w long")
    out = {r.k: r.alloc for r in largest_remainder_allocate(df, ["k"], "w", total=7).collect()}
    # shares: a=2.0, b=4.0, c=1.0 -> floors 2,4,1 sum 7, no leftover
    assert out == {"a": 2, "b": 4, "c": 1}
    out2 = {r.k: r.alloc for r in largest_remainder_allocate(df, ["k"], "w", total=8).collect()}
    # shares: a=16/7(rem 2.28->rem 10), b=32/7(rem 4.57->rem 20), c=8/7(rem 1.14->rem 5)
    # floors 2,4,1 = 7, leftover 1 goes to largest remainder (b)
    assert sum(out2.values()) == 8 and out2["b"] == 5
    # zero total allocates zero everywhere
    out0 = {r.k: r.alloc for r in largest_remainder_allocate(df, ["k"], "w", total=0).collect()}
    assert out0 == {"a": 0, "b": 0, "c": 0}


def test_prorata_zero_weights_and_all_zero(spark):
    from owl_etl_spark.operators.prorate import largest_remainder_allocate

    df = spark.createDataFrame([("a", 0), ("b", 0)], "k string, w long")
    # W == 0 with a positive total cannot be allocated proportionally
    # (the remainder rule would silently under-allocate) -> raise.
    with pytest.raises(Exception, match="zero total weight"):
        largest_remainder_allocate(df, ["k"], "w", total=5).collect()
    # W == 0 with total 0 is fine: everyone gets 0.
    out0 = {r.k: r.alloc for r in largest_remainder_allocate(df, ["k"], "w", total=0).collect()}
    assert out0 == {"a": 0, "b": 0}


def test_prorata_negative_weight_raises(spark):
    from owl_etl_spark.operators.prorate import largest_remainder_allocate

    df = spark.createDataFrame([("a", 10), ("b", -1)], "k string, w long")
    with pytest.raises(Exception, match="null/negative"):
        largest_remainder_allocate(df, ["k"], "w", total=5).collect()
    with pytest.raises(ValueError):
        largest_remainder_allocate(df, ["k"], "w", total=-1)


def test_prorata_overflow_guard_raises(spark):
    from owl_etl_spark.operators.prorate import largest_remainder_allocate

    big = 2**40
    df = spark.createDataFrame([("a", big), ("b", big)], "k string, w long")
    with pytest.raises(Exception, match="overflows"):
        largest_remainder_allocate(df, ["k"], "w", total=2**40).collect()


# ---------------------------------------------------------------------------
# k_core
# ---------------------------------------------------------------------------


def test_kcore_hand_case(spark):
    from owl_etl_spark.operators.kcore import k_core

    # triangle a-b-c plus pendant d-a: 2-core = the triangle, each deg 2
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")]
    df = spark.createDataFrame(edges, "s string, t string")
    out = {r.node: r.degree for r in k_core(df, "s", "t", k=2).collect()}
    assert out == {"a": 2, "b": 2, "c": 2}


def test_kcore_cascading_peel_and_empty(spark):
    from owl_etl_spark.operators.kcore import k_core

    # path a-b-c-d: peeling at k=2 cascades (ends first, then all)
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    df = spark.createDataFrame(edges, "s string, t string")
    assert k_core(df, "s", "t", k=2).count() == 0
    # self-loops and duplicate/reversed edges are cleaned up
    edges2 = [("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"), ("a", "c")]
    df2 = spark.createDataFrame(edges2, "s string, t string")
    out = {r.node: r.degree for r in k_core(df2, "s", "t", k=2).collect()}
    assert out == {"a": 2, "b": 2, "c": 2}
    with pytest.raises(ValueError):
        k_core(df2, "s", "t", k=0)


def test_kcore_max_rounds_raises(spark):
    from owl_etl_spark.operators.kcore import k_core

    # long path needs ~len/2 peel rounds at k=2; cap at 1 -> raises
    edges = [(f"n{i}", f"n{i+1}") for i in range(8)]
    df = spark.createDataFrame(edges, "s string, t string")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        k_core(df, "s", "t", k=2, max_rounds=1)


# ---------------------------------------------------------------------------
# grid_radius_join
# ---------------------------------------------------------------------------


def test_grid_radius_matches_bruteforce(spark):
    from owl_etl_spark.operators.geo import grid_radius_join

    import itertools
    import random

    rng = random.Random(7)
    pts = [(i, rng.randrange(0, 1000), rng.randrange(0, 1000)) for i in range(60)]
    r = 120
    want = {
        (a[0], b[0]): (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2
        for a, b in itertools.combinations(pts, 2)
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= r * r
    }
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {(row.id_a, row.id_b): row.dist2 for row in grid_radius_join(df, "id", "x", "y", r).collect()}
    assert got == want and len(got) > 5


def test_grid_radius_boundary_inclusive_and_nulls(spark):
    from owl_etl_spark.operators.geo import grid_radius_join

    pts = [(1, 0, 0), (2, 5, 0), (3, 6, 0), (4, None, 0)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {(r.id_a, r.id_b): r.dist2 for r in grid_radius_join(df, "id", "x", "y", 5).collect()}
    # (1,2) exactly at distance 5 -> included; (2,3) at 1; (1,3) at 6 -> out
    assert got == {(1, 2): 25, (2, 3): 1}
    with pytest.raises(ValueError):
        grid_radius_join(df, "id", "x", "y", 0)


# ---------------------------------------------------------------------------
# distinctive_terms
# ---------------------------------------------------------------------------


def test_distinctive_terms_hand_case(spark):
    import math

    from owl_etl_spark.operators.termstats import distinctive_terms

    # g1: "spark" 8 of 10 tokens; g2: "spark" 1 of 10 -> spark is
    # distinctly g1's term; "other" dominates g2.
    rows = [("g1", "spark", 8), ("g1", "other", 2), ("g2", "spark", 1), ("g2", "other", 9)]
    df = spark.createDataFrame(rows, "g string, term string, n long")
    out = distinctive_terms(df, "g", "term", "n", top_k=5).collect()
    got = {(r.g, r.term): r for r in out}
    assert ("g1", "spark") in got and ("g2", "other") in got
    # under-represented pairs are filtered (spark in g2, other in g1)
    assert ("g2", "spark") not in got and ("g1", "other") not in got
    r = got[("g1", "spark")]
    assert r.n_term_group == 8 and r.n_term_rest == 1 and r.rk == 1
    # verify G2 against a direct python computation of the same formula
    a, b, c, d, N = 8.0, 1.0, 2.0, 9.0, 20.0
    ct, cg = a + b, a + c

    def cell(o, rt, cti):
        return o * (math.log(o) + math.log(N) - math.log(rt) - math.log(cti)) if o > 0 else 0.0

    g2 = 2.0 * (
        cell(a, cg, ct) + cell(b, N - cg, ct) + cell(c, cg, N - ct) + cell(d, N - cg, N - ct)
    )
    assert r.g2_micro == round(g2 * 1_000_000)


def test_distinctive_terms_topk_and_ties(spark):
    from owl_etl_spark.operators.termstats import distinctive_terms

    # symmetric counts -> equal g2; tie breaks on term string
    rows = [("g1", "aa", 5), ("g1", "bb", 5), ("g2", "cc", 5), ("g2", "dd", 5)]
    df = spark.createDataFrame(rows, "g string, term string, n long")
    out = distinctive_terms(df, "g", "term", "n", top_k=1).collect()
    got = {r.g: r.term for r in out}
    assert got == {"g1": "aa", "g2": "cc"}
