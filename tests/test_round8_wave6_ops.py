"""Round-8 wave-6: pairwise MI matrix (profile.mi_matrix), DSIR
importance weights (split.importance_weights), clamped label
propagation (graph.label_propagation_seeded).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from owl_etl_spark.operators.graph import label_propagation_seeded
from owl_etl_spark.operators.profile import mi_matrix
from owl_etl_spark.operators.split import importance_weights


# ------------------------------------------------------------- mi matrix

def test_mi_matrix_known_relationships(spark):
    # y == x (perfect dependence), z independent-ish of both
    df = spark.range(4000).select(
        (F.col("id") % 4).alias("x"),
        (F.col("id") % 4).alias("y"),
        (F.col("id") % 5).alias("z"),
    )
    got = {(r["feat_a"], r["feat_b"]): r for r in mi_matrix(df, ["x", "y", "z"]).collect()}
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}
    # I(X;X-copy) = H(X) = ln 4 (uniform over 4 levels)
    assert abs(got[("x", "y")]["mi_micro_nats"] - round(math.log(4) * 1e6)) < 2000
    # id%4 and id%5 over a multiple-of-20 range are exactly independent
    assert abs(got[("x", "z")]["mi_micro_nats"]) < 2000
    assert got[("x", "y")]["n"] == 4000
    assert got[("x", "z")]["n_y"] == 5


def test_mi_matrix_needs_two_columns(spark):
    df = spark.range(10).select(F.col("id").alias("x"))
    with pytest.raises(ValueError, match="two columns"):
        mi_matrix(df, ["x"])


# ----------------------------------------------------- importance weights

def test_importance_weights_orders_by_domain_likeness(spark):
    # target domain (y=1) concentrates at high x; the classifier must
    # give high-x rows larger odds weights. The feature is BUCKETED
    # (0..9) per the logreg contract — GD with a dyadic lr needs
    # caller-scaled features (q233/q314 use the same div-bucketing)
    rows = [(i, 1 if (i % 100) >= 70 else 0, (i % 100) // 10) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, y long, x long")
    w = {r["id"]: r["weight_micro"]
         for r in importance_weights(df, "id", "y", ["x"], iterations=12, lr=0.125).collect()}
    hi = [w[i] for i in range(3000) if (i % 100) // 10 == 9]
    lo = [w[i] for i in range(3000) if (i % 100) // 10 == 0]
    assert min(hi) > max(lo)
    assert len(w) == 3000
    # odds are clipped: max weight = 0.98/0.02 = 49, min = 0.02/0.98
    assert max(w.values()) <= round(0.98 / 0.02 * 1e6)
    assert min(w.values()) >= round(0.02 / 0.98 * 1e6)


def test_importance_weights_deterministic_across_partitionings(spark):
    rows = [(i, i % 2, (i * 7) % 50) for i in range(500)]
    a = importance_weights(
        spark.createDataFrame(rows, "id long, y long, x long").repartition(1),
        "id", "y", ["x"], iterations=6)
    b = importance_weights(
        spark.createDataFrame(rows, "id long, y long, x long").repartition(13),
        "id", "y", ["x"], iterations=6)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ------------------------------------------------------ label propagation

def _edges(spark, und):
    both = und + [(b, a) for a, b in und]
    return spark.createDataFrame(both, "src long, dst long")


def test_label_prop_spreads_by_hops(spark):
    # path 0-1-2-3-4, seed only node 0 labeled "A": after k rounds
    # exactly nodes within k hops carry a label
    e = _edges(spark, [(i, i + 1) for i in range(4)])
    seeds = spark.createDataFrame([(0, "A")], "node long, label string")
    got2 = {r["node"]: r["label"]
            for r in label_propagation_seeded(e, seeds, n_iters=2).collect()}
    assert got2 == {0: "A", 1: "A", 2: "A"}
    got4 = {r["node"]: r["label"]
            for r in label_propagation_seeded(e, seeds, n_iters=4).collect()}
    assert got4 == {i: "A" for i in range(5)}


def test_label_prop_plurality_and_tiebreak(spark):
    # node 9 has two "A" neighbors and one "B" -> A; node 8 has one of
    # each -> tie breaks to the smaller label "A"
    e = _edges(spark, [(1, 9), (2, 9), (3, 9), (1, 8), (3, 8)])
    seeds = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B")], "node long, label string"
    )
    got = {r["node"]: r["label"]
           for r in label_propagation_seeded(e, seeds, n_iters=1).collect()}
    assert got[9] == "A" and got[8] == "A"


def test_label_prop_seeds_clamped(spark):
    # seed 5 ("B") is surrounded by "A" voters but must keep "B"
    e = _edges(spark, [(1, 5), (2, 5), (3, 5)])
    seeds = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (5, "B")], "node long, label string"
    )
    got = {r["node"]: r["label"]
           for r in label_propagation_seeded(e, seeds, n_iters=3).collect()}
    assert got[5] == "B"
