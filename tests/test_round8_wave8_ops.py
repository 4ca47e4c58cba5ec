"""Round-8 wave-8: Hilbert-curve layout index (zorder.hilbert_index)
and Neyman sampling allocation (split.neyman_allocation).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from owl_etl_spark.operators.split import neyman_allocation
from owl_etl_spark.operators.zorder import hilbert_index, zorder_index


def _py_xy2d(order_n: int, x: int, y: int) -> int:
    d = 0
    s = order_n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = order_n - 1 - x
                y = order_n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_python_reference(spark):
    pts = [(x, y) for x in range(0, 64, 5) for y in range(0, 64, 7)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r["x"], r["y"]): r["hvalue"]
           for r in hilbert_index(df, "x", "y", bits=6).collect()}
    for x, y in pts:
        assert got[(x, y)] == _py_xy2d(64, x, y), (x, y)


def test_hilbert_is_a_bijection_and_adjacent_steps_touch(spark):
    # order-3 curve: all 64 cells -> distinct d in [0, 64); consecutive
    # d values are grid-adjacent (the Hilbert property Morton lacks)
    pts = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {r["hvalue"]: (r["x"], r["y"])
           for r in hilbert_index(df, "x", "y", bits=3).collect()}
    assert sorted(got) == list(range(64))
    for d in range(63):
        (x1, y1), (x2, y2) = got[d], got[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_ranges_tighter_than_morton(spark):
    # the q318-vs-q166 claim in miniature: over a full 32x32 grid,
    # equal-width index ranges have smaller average bounding boxes
    # under Hilbert than under Morton
    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "x long, y long")
    h = hilbert_index(df, "x", "y", bits=5)
    z = zorder_index(df, ["x", "y"], bits=5)

    def avg_box(idxdf, col):
        rows = (
            idxdf.groupBy(F.expr(f"{col} div 64").alias("r"))
            .agg(
                (F.max("x") - F.min("x") + F.max("y") - F.min("y")).alias("span")
            )
            .collect()
        )
        return sum(r["span"] for r in rows) / len(rows)

    assert avg_box(h, "hvalue") <= avg_box(z, "zvalue")


def test_hilbert_out_of_range_raises(spark):
    df = spark.createDataFrame([(70, 1)], "x long, y long")
    with pytest.raises(Exception, match="hilbert_index"):
        hilbert_index(df, "x", "y", bits=6).collect()


# ----------------------------------------------------------------- neyman

def test_neyman_exact_arithmetic_and_proportionality(spark):
    # stratum a: values alternate 0/100 (sigma=50, n=400);
    # stratum b: constant (sigma=0, n=400);
    # stratum c: alternate 0/20 (sigma=10, n=200)
    rows = [("a", 100 * (i % 2)) for i in range(400)]
    rows += [("b", 7)] * 400
    rows += [("c", 20 * (i % 2)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in neyman_allocation(df, ["g"], "v", budget=1000).collect()}
    assert got["a"]["sigma_micro"] == 50_000_000
    assert got["b"]["sigma_micro"] == 0
    assert got["c"]["sigma_micro"] == 10_000_000
    # weights: a = 400*50 = 20000, b = 0, c = 200*10 = 2000
    assert got["a"]["weight_milli"] == 20_000_000
    assert got["b"]["weight_milli"] == 0
    assert got["c"]["weight_milli"] == 2_000_000
    assert got["a"]["alloc"] == round(1000 * 20000 / 22000)
    assert got["b"]["alloc"] == 0
    assert got["c"]["alloc"] == round(1000 * 2000 / 22000)


def test_neyman_all_constant_strata_allocates_zero(spark):
    df = spark.createDataFrame([("a", 5)] * 10 + [("b", 9)] * 10, "g string, v long")
    got = neyman_allocation(df, ["g"], "v", budget=100).collect()
    assert all(r["alloc"] == 0 for r in got)  # no variance anywhere -> degenerate


# ------------------------------------------------- threshold sweep f1

def test_threshold_sweep_exact_small_case(spark):
    from owl_etl_spark.operators.evalmetrics import threshold_sweep_f1

    # scores 1..3; positives live at high scores
    rows = [(3, 1)] * 4 + [(3, 0)] * 1 + [(2, 1)] * 1 + [(2, 0)] * 3 + [(1, 0)] * 5
    df = spark.createDataFrame(rows, "s long, y long")
    got = {r["threshold"]: r for r in threshold_sweep_f1(df, "s", "y").collect()}
    # t=3: tp=4 fp=1 fn=1 -> f1 = 8/10; t=2: tp=5 fp=4 fn=0 -> 10/14
    assert (got[3]["tp"], got[3]["fp"], got[3]["fn"]) == (4, 1, 1)
    assert got[3]["f1_micro"] == 800_000
    assert got[2]["f1_micro"] == round(10 / 14 * 1e6)
    assert got[3]["is_best"] and not got[2]["is_best"] and not got[1]["is_best"]
    assert got[1]["precision_micro"] == round(5 / 14 * 1e6)
    assert got[1]["recall_micro"] == 1_000_000


def test_threshold_sweep_tie_breaks_to_smallest_threshold(spark):
    from owl_etl_spark.operators.evalmetrics import threshold_sweep_f1

    # two thresholds with identical confusion (score 5 never appears
    # with different composition): construct equal-f1 ties
    rows = [(10, 1), (10, 1), (5, 0), (1, 0)]
    df = spark.createDataFrame(rows, "s long, y long")
    got = sorted(
        (r["threshold"], r["f1_micro"], r["is_best"])
        for r in threshold_sweep_f1(df, "s", "y").collect()
    )
    best = [t for t, _, b in got if b]
    f1s = {t: f for t, f, _ in got}
    assert len(best) == 1
    assert f1s[best[0]] == max(f1s.values())


# ---------------------------------------------------------- effect sizes

def test_effect_sizes_exact_small_case(spark):
    from owl_etl_spark.operators.effsize import effect_size_report

    # x = {3, 5}, y = {1, 3, 4}: gt pairs = (3>1)+(5>1,3,4)=4, lt = (3<4)=1
    rows = [(1, 3), (1, 5), (0, 1), (0, 3), (0, 4)]
    df = spark.createDataFrame(rows, "g long, v long")
    got = effect_size_report(df, "g", "v").collect()[0]
    assert (got["n_x"], got["n_y"]) == (2, 3)
    assert (got["n_gt"], got["n_lt"]) == (4, 1)
    assert got["cliffs_delta_micro"] == round((4 - 1) / 6 * 1e6)
    # moments: mean_x 4, mean_y 8/3; SAMPLE pooled var (Bessel, df =
    # n_x+n_y-2 = 3): n*var_pop = (n-1)*s^2, so (2*1 + 3*14/9)/3
    import math
    var_x, var_y = 1.0, (1 + 9 + 16) / 3 - (8 / 3) ** 2
    pooled = math.sqrt((2 * var_x + 3 * var_y) / 3)
    # cross-check against the textbook per-group form
    s2x = ((3 - 4) ** 2 + (5 - 4) ** 2) / 1  # n_x-1 = 1
    s2y = ((1 - 8 / 3) ** 2 + (3 - 8 / 3) ** 2 + (4 - 8 / 3) ** 2) / 2
    assert abs(pooled - math.sqrt((1 * s2x + 2 * s2y) / 3)) < 1e-12
    assert got["cohens_d_micro"] == round((4 - 8 / 3) / pooled * 1e6)


def test_effect_sizes_ties_excluded_and_symmetric_null(spark):
    from owl_etl_spark.operators.effsize import effect_size_report

    # identical distributions -> delta 0, d 0
    rows = [(g, v) for g in (0, 1) for v in (1, 2, 2, 5)]
    df = spark.createDataFrame(rows, "g long, v long")
    got = effect_size_report(df, "g", "v").collect()[0]
    assert got["cliffs_delta_micro"] == 0
    assert got["cohens_d_micro"] == 0
    assert got["n_gt"] == got["n_lt"]


def test_effect_sizes_zero_variance_gives_null_d(spark):
    from owl_etl_spark.operators.effsize import effect_size_report

    rows = [(1, 7), (1, 7), (0, 7), (0, 7)]
    df = spark.createDataFrame(rows, "g long, v long")
    got = effect_size_report(df, "g", "v").collect()[0]
    assert got["cohens_d_micro"] is None
    assert got["cliffs_delta_micro"] == 0


# ------------------------------------------------- dedup savings report

def test_dedup_savings_accounting_consistent(spark):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["q322_dedup_savings_report"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "report is empty"
    for r in rows:
        assert 0 < r["n_kept"] <= r["n_docs"]
        assert 0 < r["tokens_kept"] <= r["tokens_total"]
        want = round(
            (r["tokens_total"] - r["tokens_kept"]) / r["tokens_total"] * 1e6
        )
        assert r["savings_micro"] == want
    # corpus has planted near-dups (q34's gate depends on them), so at
    # least one source must actually save tokens
    assert any(r["savings_micro"] > 0 for r in rows)


# ------------------------------------------------ purged time folds

def test_purged_folds_partition_and_embargo(spark):
    from owl_etl_spark.operators.split import purged_time_folds

    # 100 consecutive days, k=4, embargo 3: interior boundaries at
    # 25/50/75; rows within 3 days of a boundary purge to fold -1
    df = spark.range(100).select((F.col("id") + 1000).alias("day"))
    got = {r["fold"]: r for r in
           purged_time_folds(df, "day", k=4, embargo_days=3).collect()}
    assert set(got) == {-1, 0, 1, 2, 3}
    assert sum(r["n_rows"] for r in got.values()) == 100
    # each interior boundary purges 3 days on each side = 18 total
    assert got[-1]["n_rows"] == 18
    # folds are time-ordered, non-overlapping after the purge
    assert got[0]["max_day"] < got[1]["min_day"]
    assert got[1]["max_day"] < got[2]["min_day"]
    assert got[2]["max_day"] < got[3]["min_day"]
    # edges of the corpus are NOT purged (clamped steps stay in-fold)
    assert got[0]["min_day"] == 1000 and got[3]["max_day"] == 1099


def test_purged_folds_k_too_small_raises(spark):
    from owl_etl_spark.operators.split import purged_time_folds

    df = spark.range(10).select(F.col("id").alias("day"))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="k >= 2"):
        purged_time_folds(df, "day", k=1)
