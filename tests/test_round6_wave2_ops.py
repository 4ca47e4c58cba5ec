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
