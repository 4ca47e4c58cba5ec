"""Wave-17 round-6 operators: Fellegi-Sunter linkage scoring
(operators/linkage.py), positional phrase search (operators/phrase.py),
bounded next-greater (operators/window_stats.py)."""

from __future__ import annotations

import math

import pytest

from owl_etl_spark.operators.linkage import fellegi_sunter_score, fs_weights
from owl_etl_spark.operators.phrase import phrase_search
from owl_etl_spark.operators.window_stats import next_greater_steps


# -------------------------------------------------------- Fellegi-Sunter


def test_fs_weights_signs_and_values():
    w = fs_weights([0.9], [0.1])
    assert w[0]["agree"] == round(math.log(9) * 1e6)
    assert w[0]["disagree"] == round(math.log(1 / 9) * 1e6)
    with pytest.raises(ValueError, match="0 < u < m < 1"):
        fs_weights([0.1], [0.9])


def test_fs_score_exact_and_decisions(spark):
    m, u = [0.9, 0.8], [0.1, 0.4]
    w = fs_weights(m, u)
    rows = [(1, 2, 1, 1), (3, 4, 0, 0), (5, 6, 1, 0)]
    df = spark.createDataFrame(rows, ["ida", "idb", "a1", "a2"])
    up = w[0]["agree"]  # one strong agreement suffices
    lo = w[0]["disagree"]
    out = {
        (r["ida"], r["idb"]): r
        for r in fellegi_sunter_score(df, ["a1", "a2"], m, u, up, lo).collect()
    }
    assert out[(1, 2)]["fs_score_micro"] == w[0]["agree"] + w[1]["agree"]
    assert out[(1, 2)]["decision"] == "match"
    assert out[(3, 4)]["fs_score_micro"] == w[0]["disagree"] + w[1]["disagree"]
    assert out[(3, 4)]["decision"] == "non_match"
    assert out[(5, 6)]["fs_score_micro"] == w[0]["agree"] + w[1]["disagree"]
    assert out[(5, 6)]["decision"] == "review"


def test_fs_null_agreement_raises(spark):
    df = spark.createDataFrame([(1, 2, None)], "ida int, idb int, a1 int")
    with pytest.raises(Exception, match="0/1"):
        fellegi_sunter_score(df, ["a1"], [0.9], [0.1], 1, -1).collect()


# --------------------------------------------------------- phrase search


def test_phrase_counts_and_positions(spark):
    docs = [
        (1, "the table scan wins"),          # one match at pos 2
        (2, "table scan table scan"),        # two matches, first at 1
        (3, "scan table"),                   # reversed -> no match
        (4, "table x scan"),                 # gap -> no match
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in phrase_search(df, "doc_id", "text", "table scan").collect()}
    assert set(out) == {1, 2}
    assert (out[1]["n_matches"], out[1]["first_pos"]) == (1, 2)
    assert (out[2]["n_matches"], out[2]["first_pos"]) == (2, 1)


def test_phrase_overlapping_and_repeated_words(spark):
    # phrase with a repeated word; overlapping occurrences both count
    df = spark.createDataFrame([(1, "go go go stop")], ["doc_id", "text"])
    out = phrase_search(df, "doc_id", "text", "go go").collect()
    assert out[0]["n_matches"] == 2 and out[0]["first_pos"] == 1


def test_phrase_three_words(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x c")], ["doc_id", "text"]
    )
    out = phrase_search(df, "doc_id", "text", "a b c").collect()
    assert [r["doc_id"] for r in out] == [1]


def test_phrase_single_word_raises(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="2 tokens"):
        phrase_search(df, "doc_id", "text", "solo")


# ----------------------------------------------------------- next greater


def test_next_greater_hand_case(spark):
    # values 5 3 4 6 2: steps = 3 (6 at +3), 1 (4), 1 (6), null, null
    rows = [(1, i, v) for i, v in enumerate([5, 3, 4, 6, 2])]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = {r["t"]: r["steps_to_greater"] for r in next_greater_steps(df, ["k"], "t", "v").collect()}
    assert out == {0: 3, 1: 1, 2: 1, 3: None, 4: None}


def test_next_greater_horizon_bound(spark):
    # greater value exists but beyond max_look -> null
    vals = [10] + [1] * 5 + [99]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = {r["t"]: r["steps_to_greater"] for r in next_greater_steps(df, ["k"], "t", "v", max_look=3).collect()}
    assert out[0] is None  # 99 is 6 steps away, horizon is 3
    assert out[3] == 3  # from index 3 the 99 is exactly 3 ahead


def test_next_greater_strictness_and_guard(spark):
    rows = [(1, 0, 5), (1, 1, 5), (1, 2, 5)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = next_greater_steps(df, ["k"], "t", "v").collect()
    assert all(r["steps_to_greater"] is None for r in out)  # equal is not greater
    with pytest.raises(ValueError, match="max_look"):
        next_greater_steps(df, ["k"], "t", "v", max_look=0)
