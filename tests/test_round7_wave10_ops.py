"""Round-7 wave-10 operators: Mondrian k-anonymity (privacy.py),
bounded-window EWMA (forecast.py), empirical-Bayes shrinkage
(shrinkage.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from owl_etl_spark.operators.forecast import _ewma_weights, ewma_smooth
from owl_etl_spark.operators.privacy import mondrian_partitions
from owl_etl_spark.operators.shrinkage import eb_shrunk_rates


# ----------------------------------------------------------------- Mondrian


def _qi_rows(spark, n=200):
    # x spread wide (0..1990), y narrow (0..9): first cuts go on x
    rows = [(i * 10, i % 10, f"k{i}") for i in range(n)]
    return spark.createDataFrame(rows, "x long, y long, k string")


def test_mondrian_every_leaf_has_k(spark):
    df = _qi_rows(spark)
    out = mondrian_partitions(df, "x", "y", "k", k=25, depth=5).collect()
    assert all(r.n >= 25 for r in out)
    assert sum(r.n for r in out) == 200
    assert len(out) > 1  # it actually cut


def test_mondrian_cells_partition_the_x_axis(spark):
    df = _qi_rows(spark)
    out = sorted(mondrian_partitions(df, "x", "y", "k", k=25, depth=5).collect(),
                 key=lambda r: r.min_x)
    # wide-x data: cuts land on x, so cells are disjoint x-ranges
    for a, b in zip(out, out[1:]):
        assert a.max_x < b.min_x


def test_mondrian_small_group_never_cut(spark):
    rows = [(i, 0, f"k{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "x long, y long, k string")
    out = mondrian_partitions(df, "x", "y", "k", k=25, depth=4).collect()
    # 30 rows can't split into two >= 25 halves: single root leaf
    assert len(out) == 1 and out[0].n == 30 and out[0].gid == "r"


def test_mondrian_deterministic(spark):
    df = _qi_rows(spark, 120)
    a = sorted((r.gid, r.n) for r in mondrian_partitions(df, "x", "y", "k").collect())
    b = sorted(
        (r.gid, r.n)
        for r in mondrian_partitions(df.repartition(7), "x", "y", "k").collect()
    )
    assert a == b


def test_mondrian_k_guard(spark):
    df = _qi_rows(spark, 10)
    with pytest.raises(ValueError, match="k must be"):
        mondrian_partitions(df, "x", "y", "k", k=1)


# -------------------------------------------------------------------- EWMA


def test_ewma_constant_series_is_identity(spark):
    rows = [("s", t, 500) for t in range(40)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    out = ewma_smooth(df, "k", "t", "v").collect()
    assert all(r.ewma_micro == 500 * 10**6 for r in out)


def test_ewma_tracks_reference_recurrence(spark):
    # vs the float recurrence s_t = a*y_t + (1-a)*s_{t-1}: after the
    # 32-lag warmup the truncated kernel matches to ~the weight quantum
    vals = [(t * 37) % 1000 for t in range(80)]
    rows = [("s", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    out = {r.t: r.ewma_micro / 1e6 for r in ewma_smooth(df, "k", "t", "v").collect()}
    a, s = 0.25, vals[0]
    for t, v in enumerate(vals):
        if t:
            s = a * v + (1 - a) * s
        if t >= 40:
            assert abs(out[t] - s) < 1.0, (t, out[t], s)


def test_ewma_head_is_normalized_partial_kernel(spark):
    # first row: only w0 participates -> ewma == value exactly
    rows = [("s", 0, 123), ("s", 1, 999)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    out = {r.t: r.ewma_micro for r in ewma_smooth(df, "k", "t", "v").collect()}
    assert out[0] == 123 * 10**6
    w = _ewma_weights(1, 4, 32)
    expect = (999 * w[0] + 123 * w[1]) * 10**6 // (w[0] + w[1])
    assert out[1] == expect


# ------------------------------------------------------------ EB shrinkage


def test_eb_small_groups_shrink_harder(spark):
    rows = []
    rows += [("big", 1)] * 300 + [("big", 0)] * 700      # 30% on n=1000
    rows += [("tiny", 1)] * 2 + [("tiny", 0)] * 1        # 67% on n=3
    rows += [("mid", 1)] * 40 + [("mid", 0)] * 60        # 40% on n=100
    df = spark.createDataFrame(rows, "g string, s long")
    out = {r.group: r for r in eb_shrunk_rates(df, "g", "s").collect()}
    # shrinkage distance grows as n falls
    def pull(r):
        return abs(r.shrunk_micro - r.rate_micro)
    assert pull(out["tiny"]) > pull(out["mid"]) > pull(out["big"])
    # shrunk values stay between the raw rate and the global mean
    m = sum(r.rate_micro for r in out.values()) // 3
    for r in out.values():
        lo, hi = sorted((r.rate_micro, m))
        assert lo - 2 <= r.shrunk_micro <= hi + 2


def test_eb_needs_two_groups(spark):
    df = spark.createDataFrame([("only", 1), ("only", 0)], "g string, s long")
    with pytest.raises(Exception, match="2 groups"):
        eb_shrunk_rates(df, "g", "s").collect()


def test_eb_identical_groups_collapse_to_mean(spark):
    rows = [(g, v) for g in ("a", "b") for v in ([1] * 5 + [0] * 5)]
    df = spark.createDataFrame(rows, "g string, s long")
    out = eb_shrunk_rates(df, "g", "s").collect()
    # zero spread -> infinite prior strength -> everything at the mean
    assert all(abs(r.shrunk_micro - 500_000) <= 1 for r in out)
