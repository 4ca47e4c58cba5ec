"""Round-7 wave-8 operators: RANSAC line fit (ransac.py), SimRank
(graph.py), Huber M-location (robust.py)."""

from __future__ import annotations

import pytest

# r13 test tiering (VERDICT r12 #2): this suite runs in the FULL tier
# (tools/round_close.py --full-tests); the default time-boxed tier
# excludes it so the driver's verification window completes.
pytestmark = pytest.mark.full

from pyspark.sql import functions as F

from owl_etl_spark.operators.graph import simrank
from owl_etl_spark.operators.ransac import ransac_line_fit
from owl_etl_spark.operators.robust import huber_location


# ----------------------------------------------------------------- RANSAC


def _line_points(spark, outliers=10):
    # y = 3x + 5 exactly for 90 points, plus wild outliers
    rows = [(x, 3 * x + 5, f"p{x}") for x in range(90)]
    rows += [(x, 100_000 + 13 * x, f"o{x}") for x in range(outliers)]
    return spark.createDataFrame(rows, "x long, y long, k string")


def test_ransac_recovers_planted_line(spark):
    df = _line_points(spark)
    out = ransac_line_fit(df, "x", "y", "k", n_candidates=32, tol=0).collect()
    best = [r for r in out if r.is_best]
    assert len(best) == 1
    b = best[0]
    # a candidate drawn from two exact-line points explains all 90
    assert b.n_inliers >= 85
    assert b.slope_micro == 3_000_000


def test_ransac_inliers_beat_any_outlier_candidate(spark):
    df = _line_points(spark)
    out = ransac_line_fit(df, "x", "y", "k", n_candidates=32, tol=0).collect()
    best_count = max(r.n_inliers for r in out)
    # the contaminating population is only 10 points: no candidate
    # through outliers can beat the structure
    assert best_count >= 85


def test_ransac_deterministic_and_degenerates_visible(spark):
    df = _line_points(spark, outliers=5)
    a = sorted((r.candidate, r.n_inliers, r.slope_micro) for r in
               ransac_line_fit(df, "x", "y", "k", n_candidates=16).collect())
    b = sorted((r.candidate, r.n_inliers, r.slope_micro) for r in
               ransac_line_fit(df.repartition(7), "x", "y", "k", n_candidates=16).collect())
    assert a == b
    assert len(a) == 16  # degenerate candidates stay in the report


def test_ransac_headroom_guard(spark):
    rows = [(0, 0, "a"), (10**7, 10**7, "b")]
    df = spark.createDataFrame(rows, "x long, y long, k string")
    with pytest.raises(Exception, match="headroom"):
        ransac_line_fit(df, "x", "y", "k", max_product=10).collect()


# ---------------------------------------------------------------- SimRank


def test_simrank_structurally_equivalent_nodes_score_high(spark):
    # b and c have IDENTICAL in-neighborhoods ({a}) -> after one round
    # S(b,c) = C * S(a,a) = 0.8
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("d", "e")], "src string, dst string"
    )
    nodes = spark.createDataFrame([(x,) for x in "abcde"], "node string")
    out = {(r.node_a, r.node_b): r.simrank_micro
           for r in simrank(edges, nodes, n_iters=2).collect()}
    assert out[("b", "c")] == 800_000
    assert ("b", "e") not in out or out[("b", "e")] == 0


def test_simrank_no_shared_structure_scores_zero(spark):
    edges = spark.createDataFrame([("a", "b"), ("c", "d")], "src string, dst string")
    nodes = spark.createDataFrame([(x,) for x in "abcd"], "node string")
    out = simrank(edges, nodes, n_iters=3).collect()
    # b and d have disjoint in-neighborhoods with S(a,c)=0 forever
    assert all(r.simrank_micro == 0 for r in out if (r.node_a, r.node_b) == ("b", "d"))


def test_simrank_max_nodes_guard(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "node string")
    with pytest.raises(ValueError, match="contract the graph"):
        simrank(edges, nodes, max_nodes=2)


# ------------------------------------------------------------------- Huber


def test_huber_resists_outliers_mean_does_not(spark):
    rows = [("g", 100)] * 95 + [("g", 1_000_000)] * 5
    df = spark.createDataFrame(rows, "g string, y long")
    out = huber_location(df, "g", "y", k=50, n_iters=5).collect()[0]
    # plain mean dragged to ~50095; huber stays near 100
    assert out.mean_micro > 50_000 * 10**6
    assert out.huber_micro < 500 * 10**6
    assert out.huber_micro >= 100 * 10**6


def test_huber_clean_data_equals_mean(spark):
    rows = [("g", v) for v in (10, 12, 14, 16)]
    df = spark.createDataFrame(rows, "g string, y long")
    out = huber_location(df, "g", "y", k=100).collect()[0]
    # all residuals within k -> every weight 1e6 -> mean (floored)
    assert out.huber_micro == 13 * 10**6
    assert out.mean_micro == 13 * 10**6


def test_huber_deterministic_under_repartition(spark):
    rows = [("g", v * 7 % 400) for v in range(200)] + [("g", 10**6)] * 3
    df = spark.createDataFrame(rows, "g string, y long")
    a = huber_location(df, "g", "y").collect()[0].huber_micro
    b = huber_location(df.repartition(11), "g", "y").collect()[0].huber_micro
    assert a == b


def test_huber_iter_guard(spark):
    df = spark.createDataFrame([("g", 1)], "g string, y long")
    with pytest.raises(ValueError, match="n_iters"):
        huber_location(df, "g", "y", n_iters=0)
