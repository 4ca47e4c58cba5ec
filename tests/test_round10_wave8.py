"""Round-10 wave 8 (operators/repetition.py + the Welch/Jonckheere-
Terpstra/Cochran additions to operators/inference.py): pure-Python
reference parity and planted-verdict cases."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from owl_etl_spark.operators.inference import (
    cochran_q,
    jonckheere_terpstra,
    welch_anova,
)
from owl_etl_spark.operators.repetition import ngram_repetition_profile

M = 1_000_000


def test_repetition_profile_exact_counts(spark):
    docs = [
        (1, "click here click here click here now"),   # 7 tokens
        (2, "the quick brown fox jumps over dogs"),     # no repeats
        (3, "a b a b a b a b"),                         # 8 tokens, loop
        (4, "x y"),                                     # too short: excluded
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in ngram_repetition_profile(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}
    # doc 1: bigrams = [click here, here click, click here, here click,
    # click here, here now] -> top 'click here' = 3 of 6
    assert out[1].top_bigram_count == 3 and out[1].n_bigrams == 6
    assert out[1].top_bigram_share_micro == 500_000
    # doc 1 trigrams: [chc, hch, chc, hch, chn] -> dup rows chc(2)+hch(2)=4 of 5
    assert out[1].dup_trigram_count == 4 and out[1].n_trigrams == 5
    assert out[1].dup_trigram_share_micro == 800_000
    # doc 2: everything unique
    assert out[2].top_bigram_count == 1 and out[2].dup_trigram_count == 0
    # doc 3: "a b" 4 times of 7 slots; all 6 trigrams are dups (aba x3 / bab x3)
    assert out[3].top_bigram_count == 4
    assert out[3].dup_trigram_count == 6 and out[3].n_trigrams == 6
    assert out[3].dup_trigram_share_micro == M


def _ref_welch(groups: dict[str, list[int]]):
    k = len(groups)
    w = {g: len(v) / _var(v) for g, v in groups.items()}
    m = {g: sum(v) / len(v) for g, v in groups.items()}
    sw = sum(w.values())
    mw = sum(w[g] * m[g] for g in groups) / sw
    a = sum(w[g] * (m[g] - mw) ** 2 for g in groups) / (k - 1)
    b = sum((1 - w[g] / sw) ** 2 / (len(v) - 1) for g, v in groups.items())
    return a / (1 + 2 * (k - 2) / (k * k - 1) * b)


def _var(v):
    mean = sum(v) / len(v)
    return sum((x - mean) ** 2 for x in v) / (len(v) - 1)


def test_welch_anova_matches_reference(spark):
    groups = {
        "a": [10, 12, 9, 11, 14, 10, 13],
        "b": [22, 45, 9, 34, 21, 2],       # high variance
        "c": [15, 14, 17, 13, 16],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    row = welch_anova(
        spark.createDataFrame(rows, "g string, v long"), "g", "v"
    ).collect()[0]
    assert row.k_groups == 3 and row.n == 18
    # the snapped pipeline tracks the float reference to ~1e-4 relative
    assert row.w_stat_micro == pytest.approx(_ref_welch(groups) * M, rel=2e-4)


def test_welch_excludes_degenerate_groups(spark):
    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 5), ("b", 5), ("c", 9)]
    # b has zero variance (w infinite -> excluded via round overflow? no:
    # var=0 -> division yields inf -> cast long overflow) — c has n=1
    row = welch_anova(
        spark.createDataFrame(rows, "g string, v long"), "g", "v"
    ).collect()[0]
    # only group a survives -> k=1 -> NULL statistic
    assert row.k_groups == 1 and row.w_stat_micro is None


def _ref_jt(groups: list[list[int]]):
    jt2 = 0
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            for x in groups[i]:
                for y in groups[j]:
                    jt2 += 2 * (y > x) + 1 * (y == x)
    return jt2


def test_jonckheere_matches_bruteforce_with_ties(spark):
    groups = {"g1": [1, 3, 3, 5], "g2": [4, 4, 6, 3], "g3": [7, 6, 9, 9, 5]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    row = jonckheere_terpstra(
        spark.createDataFrame(rows, "g string, v long"), "g", "v"
    ).collect()[0]
    assert row.jt2 == _ref_jt([groups["g1"], groups["g2"], groups["g3"]])
    n = 13
    assert row.mean4 == n * n - (16 + 16 + 25)
    assert row.z_micro is not None and row.z_micro > 0  # planted increasing


def test_jonckheere_reversed_order_flips_sign(spark):
    groups = {"g1": [9, 8, 7], "g2": [5, 6, 4], "g3": [1, 2, 3]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    row = jonckheere_terpstra(
        spark.createDataFrame(rows, "g string, v long"), "g", "v"
    ).collect()[0]
    assert row.z_micro < 0
    # no ties, perfectly decreasing: jt2 = 0
    assert row.jt2 == 0


def test_cochran_q_textbook(spark):
    # 3 judges x 8 items
    rows = [
        (True, True, False),
        (True, True, True),
        (True, False, False),
        (True, True, False),
        (False, True, False),
        (True, True, True),
        (True, False, False),
        (True, True, False),
    ]
    df = spark.createDataFrame(rows, "a boolean, b boolean, c boolean")
    r = cochran_q(df, ["a", "b", "c"]).collect()[0]
    assert (r.pass_a, r.pass_b, r.pass_c) == (7, 6, 2)
    k, cs, n_r = 3, [7, 6, 2], [sum(x) for x in rows]
    q = (k - 1) * (k * sum(c * c for c in cs) - sum(n_r) ** 2) / (
        k * sum(n_r) - sum(x * x for x in n_r)
    )
    assert r.q_micro == pytest.approx(q * M, abs=2)


def test_cochran_q_identical_gates_is_zero(spark):
    rows = [(True, True, True)] * 4 + [(False, False, False)] * 4
    r = cochran_q(
        spark.createDataFrame(rows, "a boolean, b boolean, c boolean"),
        ["a", "b", "c"],
    ).collect()[0]
    # all-or-none rows -> denominator k*sum_r - sum_r2 = 0 -> NULL
    assert r.q_micro is None


def test_cochran_q_requires_two_gates(spark):
    df = spark.createDataFrame([(True,)], "a boolean")
    with pytest.raises(ValueError):
        cochran_q(df, ["a"])


# --- wave 9: Page-Hinkley + Fleiss' kappa ---------------------------------

from owl_etl_spark.operators.inference import fleiss_kappa
from owl_etl_spark.operators.trend import page_hinkley


def test_page_hinkley_exact_reference_and_alarm(spark):
    xs = [10, 11, 9, 10, 10, 30, 32, 31, 33, 35]  # planted level shift at t=5
    df = spark.createDataFrame(list(enumerate(xs)), "t long, x long")
    out = {
        r.t: r
        for r in page_hinkley(df, "t", "x", lambda_micro=20 * M).collect()
    }
    # replay the exact integer recurrence
    cs = 0
    m = 0
    mins = []
    for i, x in enumerate(xs):
        cs += x
        mean = (cs * M) // (i + 1)
        m += x * M - mean
        mins.append(m)
        ph = m - min(mins)
        assert out[i].mean_micro == mean
        assert out[i].m_micro == m
        assert out[i].ph_micro == ph
    # alarm fires only after the shift
    assert all(out[i].alarm == 0 for i in range(5))
    assert out[9].alarm == 1


def test_page_hinkley_flat_series_never_alarms(spark):
    df = spark.createDataFrame([(i, 5) for i in range(10)], "t long, x long")
    out = page_hinkley(df, "t", "x", lambda_micro=1).collect()
    assert all(r.ph_micro == 0 and r.alarm == 0 for r in out)


def _ref_fleiss(rows: list[tuple[bool, bool, bool]]) -> float:
    k = 3
    n = len(rows)
    rs = [sum(r) for r in rows]
    pbar = sum(r * (r - 1) + (k - r) * (k - r - 1) for r in rs) / (n * k * (k - 1))
    p = sum(rs) / (n * k)
    pe = p * p + (1 - p) * (1 - p)
    return (pbar - pe) / (1 - pe)


def test_fleiss_kappa_matches_reference(spark):
    rows = [
        (True, True, True),
        (True, True, False),
        (False, False, False),
        (True, False, True),
        (False, False, True),
        (True, True, True),
        (False, False, False),
        (True, False, False),
    ]
    df = spark.createDataFrame(rows, "a boolean, b boolean, c boolean")
    r = fleiss_kappa(df, ["a", "b", "c"]).collect()[0]
    assert r.n == 8 and r.k_gates == 3
    assert r.kappa_micro == pytest.approx(_ref_fleiss(rows) * M, abs=3)


def test_fleiss_kappa_perfect_agreement_is_one(spark):
    rows = [(True, True, True)] * 3 + [(False, False, False)] * 5
    r = fleiss_kappa(
        spark.createDataFrame(rows, "a boolean, b boolean, c boolean"),
        ["a", "b", "c"],
    ).collect()[0]
    assert r.kappa_micro == M


def test_fleiss_kappa_unanimous_single_category_is_null(spark):
    rows = [(True, True, True)] * 5
    r = fleiss_kappa(
        spark.createDataFrame(rows, "a boolean, b boolean, c boolean"),
        ["a", "b", "c"],
    ).collect()[0]
    assert r.kappa_micro is None  # P_e = 1: agreement is vacuous


# --- wave 12: Wilson score intervals ----------------------------------------

from owl_etl_spark.operators.inference import wilson_intervals


def test_wilson_matches_textbook(spark):
    import math

    rows = [("a", 1)] * 8 + [("a", 0)] * 2 + [("b", 1)] * 1 + [("b", 0)] * 9
    df = spark.createDataFrame(rows, "g string, k long")
    out = {r.group: r for r in wilson_intervals(df, "g", "k").collect()}

    def ref(k, n, z=1.96):
        p = k / n
        denom = 1 + z * z / n
        c = (p + z * z / (2 * n)) / denom
        h = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
        return c - h, c + h

    lo, hi = ref(8, 10)
    assert out["a"].p_micro == 800_000
    assert out["a"].wilson_lo_micro == pytest.approx(lo * M, abs=2)
    assert out["a"].wilson_hi_micro == pytest.approx(hi * M, abs=2)
    # interval is inside [0, 1] and contains p-hat
    for r in out.values():
        assert 0 <= r.wilson_lo_micro <= r.p_micro <= r.wilson_hi_micro <= M


def test_wilson_extreme_rates_stay_informative(spark):
    # p-hat = 0: the Wald interval would be [0, 0]; Wilson must not be
    rows = [("z", 0)] * 20
    r = wilson_intervals(
        spark.createDataFrame(rows, "g string, k long"), "g", "k"
    ).collect()[0]
    assert r.p_micro == 0 and r.wilson_lo_micro == 0
    assert r.wilson_hi_micro > 100_000  # ~0.161 at n=20
