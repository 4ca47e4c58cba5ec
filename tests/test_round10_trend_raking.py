"""Round-10 wave 7 (operators/trend.py, operators/raking.py, plus the
pairwise-Tukey / McNemar additions to operators/inference.py):
pure-Python reference parity, planted-verdict cases, and the IPF
marginal-matching law."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from owl_etl_spark.operators.inference import mcnemar_test, pairwise_tukey
from owl_etl_spark.operators.raking import ipf_rake
from owl_etl_spark.operators.trend import mann_kendall_sen

M = 1_000_000


def _series_df(spark, xs: list[int]):
    return spark.createDataFrame(list(enumerate(xs)), "t long, x long")


def _ref_mk_s(xs: list[int]) -> int:
    s = 0
    for i in range(len(xs)):
        for j in range(i + 1, len(xs)):
            s += (xs[j] > xs[i]) - (xs[j] < xs[i])
    return s


def _ref_var18(xs: list[int]) -> int:
    from collections import Counter

    n = len(xs)
    return n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(xs).values()
    )


def test_mann_kendall_matches_reference_with_ties(spark):
    xs = [3, 5, 5, 4, 8, 8, 8, 10, 9, 12]
    row = mann_kendall_sen(_series_df(spark, xs), "t", "x").collect()[0]
    assert row.n_points == 10 and row.n_pairs == 45
    assert row.s_stat == _ref_mk_s(xs)
    assert row.var18 == _ref_var18(xs)
    import math

    zref = (row.s_stat - 1) / math.sqrt(row.var18 / 18.0)
    assert row.z_micro == pytest.approx(zref * M, abs=2)
    # Sen's doubled median equals the two middle pairwise fd-slopes
    slopes = sorted(
        ((xs[j] - xs[i]) * M) // (j - i)
        for i in range(10)
        for j in range(i + 1, 10)
    )
    m = len(slopes)
    assert row.sen_slope2_micro == slopes[(m + 1) // 2 - 1] + slopes[m // 2]


def test_mann_kendall_strict_monotone_is_max_s(spark):
    xs = [1, 2, 3, 4, 5, 6]
    row = mann_kendall_sen(_series_df(spark, xs), "t", "x").collect()[0]
    assert row.s_stat == 15  # all 15 pairs concordant
    assert row.sen_slope2_micro == 2 * M  # slope exactly 1/step


def test_mann_kendall_all_tied_is_null_z(spark):
    row = mann_kendall_sen(_series_df(spark, [7] * 5), "t", "x").collect()[0]
    assert row.s_stat == 0 and row.z_micro is None


def test_pairwise_tukey_matches_reference(spark):
    groups = {"a": [10, 12, 9, 11], "b": [22, 25, 19], "c": [15, 14, 17, 13, 16]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {(r.group_a, r.group_b): r for r in pairwise_tukey(df, "g", "v").collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    import math

    n = sum(len(v) for v in groups.values())
    k = len(groups)
    ssw = sum(sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values())
    msw = ssw / (n - k)
    for (ga, gb), r in out.items():
        ma = sum(groups[ga]) / len(groups[ga])
        mb = sum(groups[gb]) / len(groups[gb])
        q = abs(ma - mb) / math.sqrt(
            (msw / 2) * (1 / len(groups[ga]) + 1 / len(groups[gb]))
        )
        assert r.q_micro == pytest.approx(q * M, abs=5)
    # largest contrast is a-vs-b (planted)
    assert out[("a", "b")].q_micro > out[("a", "c")].q_micro


def test_mcnemar_textbook_cells(spark):
    # classic 2x2: only_a=25, only_b=5 -> ((|20|-1)^2)/30
    rows = (
        [(True, True)] * 40 + [(True, False)] * 25 + [(False, True)] * 5
        + [(False, False)] * 30
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = mcnemar_test(df, "a", "b").collect()[0]
    assert (r.both_pass, r.only_a, r.only_b, r.neither) == (40, 25, 5, 30)
    assert r.mcnemar_micro == round(19**2 / 30 * M)
    assert r.discordance_odds_micro == 5 * M


def test_mcnemar_equal_discordance_clamps_to_zero(spark):
    rows = [(True, False)] * 4 + [(False, True)] * 4
    r = mcnemar_test(spark.createDataFrame(rows, "a boolean, b boolean"), "a", "b").collect()[0]
    # |b-c| = 0 -> corrected gap clamps at 0, statistic 0 (not 1/(b+c))
    assert r.mcnemar_micro == 0


def test_mcnemar_no_discordance_is_null(spark):
    rows = [(True, True)] * 5 + [(False, False)] * 5
    r = mcnemar_test(spark.createDataFrame(rows, "a boolean, b boolean"), "a", "b").collect()[0]
    assert r.mcnemar_micro is None and r.discordance_odds_micro is None


def _ref_ipf(cells: dict[tuple[str, str], int], rounds: int):
    """Same snapped-integer trajectory as the operator."""
    nt = sum(cells.values())
    rows = sorted({r for r, _ in cells})
    cols = sorted({c for _, c in cells})
    rt = nt * M // len(rows)
    ct = nt * M // len(cols)
    m = {k: v * M for k, v in cells.items()}
    for _ in range(rounds):
        rs = {r: sum(m[k] for k in m if k[0] == r) for r in rows}
        m = {k: round(m[k] * rt / rs[k[0]]) for k in m}
        cs = {c: sum(m[k] for k in m if k[1] == c) for c in cols}
        m = {k: round(m[k] * ct / cs[k[1]]) for k in m}
    return m


def test_ipf_matches_snapped_reference_exactly(spark):
    cells = {
        ("s1", "en"): 50, ("s1", "de"): 10, ("s1", "fr"): 5,
        ("s2", "en"): 20, ("s2", "de"): 20, ("s2", "fr"): 10,
        ("s3", "en"): 5, ("s3", "de"): 5, ("s3", "fr"): 40,
    }
    rows = [(r, c) for (r, c), n in cells.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "src string, lang string")
    got = {
        (r.row_cat, r.col_cat): r for r in ipf_rake(df, "src", "lang").collect()
    }
    ref = _ref_ipf(cells, 8)
    for k, v in ref.items():
        assert got[k].m_micro == v  # bit-identical integer trajectory
        assert got[k].weight_micro == v // cells[k]


def test_ipf_marginals_converge_to_uniform(spark):
    cells = {
        ("s1", "en"): 50, ("s1", "de"): 10, ("s1", "fr"): 5,
        ("s2", "en"): 20, ("s2", "de"): 20, ("s2", "fr"): 10,
        ("s3", "en"): 5, ("s3", "de"): 5, ("s3", "fr"): 40,
    }
    rows = [(r, c) for (r, c), n in cells.items() for _ in range(n)]
    out = ipf_rake(
        spark.createDataFrame(rows, "src string, lang string"), "src", "lang"
    ).collect()
    nt = sum(cells.values())
    target_col = nt * M / 3
    # after 8 rounds (ending on a column scaling) the column marginals
    # are exact to the snap; row marginals within a relative hair
    from collections import defaultdict

    colsum = defaultdict(int)
    rowsum = defaultdict(int)
    for r in out:
        colsum[r.col_cat] += r.m_micro
        rowsum[r.row_cat] += r.m_micro
    for c, s in colsum.items():
        assert s == pytest.approx(target_col, abs=5)
    for rr, s in rowsum.items():
        assert s == pytest.approx(nt * M / 3, rel=1e-4)


def test_ipf_structural_zeros_stay_absent(spark):
    rows = [("s1", "en")] * 5 + [("s1", "de")] * 5 + [("s2", "en")] * 5
    out = ipf_rake(
        spark.createDataFrame(rows, "src string, lang string"), "src", "lang"
    ).collect()
    assert len(out) == 3  # the (s2, de) cell never materializes
