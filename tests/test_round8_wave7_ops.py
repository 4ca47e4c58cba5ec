"""Round-8 wave-7: overdispersion diagnostic
(profile.overdispersion_report) and O'Brien-Fleming group-sequential
readout (experiment.group_sequential_readout).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from owl_etl_spark.operators.experiment import group_sequential_readout
from owl_etl_spark.operators.profile import overdispersion_report


def test_overdispersion_poisson_vs_clumped(spark):
    # "poisson": deterministic near-uniform counts 0..3 (var < mean);
    # "clumped": mostly 0 with rare bursts of 40 (var >> mean)
    rows = [("p", i % 4) for i in range(400)]
    rows += [("c", 40 if i % 20 == 0 else 0) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, x long")
    got = {r["g"]: r for r in overdispersion_report(df, ["g"], "x").collect()}
    assert got["c"]["alpha_micro"] > 1_000_000  # heavily overdispersed
    assert got["p"]["alpha_micro"] < 0  # under-dispersed (uniform)
    # exact moments: mean of c = 2, var = 4*19 = 76 -> alpha = 74/4
    assert got["c"]["mean_micro"] == 2_000_000
    assert got["c"]["var_micro"] == 76_000_000
    assert got["c"]["alpha_micro"] == round(74 / 4 * 1e6)


def test_overdispersion_zero_counts_guarded(spark):
    df = spark.createDataFrame([("z", 0), ("z", 0)], "g string, x long")
    got = overdispersion_report(df, ["g"], "x").collect()[0]
    assert got["alpha_micro"] is None and got["mean_micro"] == 0


def test_group_sequential_boundaries_and_detection(spark):
    # group 1 shifted by +50 from look 1 on: z grows with cumulative n,
    # boundaries shrink with k — rejection should appear by later looks
    rows = []
    for look in range(1, 5):
        for i in range(500):
            base = 1000 + (i * 17) % 100
            rows.append((look, 1, base + 50))
            rows.append((look, 0, base))
    df = spark.createDataFrame(rows, "look long, g long, v long")
    got = {r["look"]: r for r in
           group_sequential_readout(df, "look", "g", "v", n_looks=4).collect()}
    assert len(got) == 4
    # boundary at look k = round(2.024 * sqrt(4/k) * 1000)
    for k in range(1, 5):
        assert got[k]["boundary_milli"] == round(2.024 * math.sqrt(4 / k) * 1000)
    assert got[1]["boundary_milli"] > got[4]["boundary_milli"]
    # constant +50 shift on a bounded base: z is enormous by look 4
    assert got[4]["reject"] is True
    assert got[4]["diff_micro"] == 50_000_000
    # cumulative sample sizes grow by 500/look/arm
    assert [got[k]["n_a"] for k in range(1, 5)] == [500, 1000, 1500, 2000]


def test_group_sequential_null_effect_never_rejects(spark):
    rows = []
    for look in range(1, 5):
        for i in range(400):
            base = 1000 + (i * 13) % 97
            rows.append((look, i % 2, base))
    df = spark.createDataFrame(rows, "look long, g long, v long")
    got = group_sequential_readout(df, "look", "g", "v", n_looks=4).collect()
    assert all(not r["reject"] for r in got)


def test_group_sequential_single_arm_look_raises(spark):
    import pytest

    # look 2 has rows only for arm 1 -> must raise, not vanish
    rows = [(1, 1, 10), (1, 1, 12), (1, 0, 9), (1, 0, 11), (2, 1, 10), (2, 1, 13)]
    df = spark.createDataFrame(rows, "look long, g long, v long")
    with pytest.raises(Exception, match="only one arm"):
        group_sequential_readout(df, "look", "g", "v", n_looks=2).collect()


def test_group_sequential_zero_variance_look_raises(spark):
    import pytest

    # both arms constant at look 1 -> se = 0 -> z undefined -> raise
    rows = [(1, 1, 10), (1, 1, 10), (1, 0, 10), (1, 0, 10)]
    df = spark.createDataFrame(rows, "look long, g long, v long")
    with pytest.raises(Exception, match="zero pooled variance"):
        group_sequential_readout(df, "look", "g", "v", n_looks=1).collect()
