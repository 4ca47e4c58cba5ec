"""As-of and range join edge semantics."""

from __future__ import annotations

import datetime


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m, 0)


def test_asof_backward_with_ties_and_missing(spark):
    from owl_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(5), "p2"), (2, _ts(1), "p3")],
        ["user_id", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 100.0), (1, _ts(9), 200.0), (1, _ts(11), 300.0)],
        ["user_id", "ts", "v"],
    )
    out = {
        r.tag: (r.v_asof, r.ts_asof)
        for r in asof_join(
            left, right, ["user_id"], "ts", "ts", right_cols=["v", "ts"]
        ).collect()
    }
    assert out["p1"] == (200.0, _ts(9))       # latest <= 00:10
    assert out["p2"] == (100.0, _ts(5))       # tie at equal ts matches
    assert out["p3"] == (None, None)          # no right row for user 2


def test_range_join_bucketing_exact(spark):
    from owl_etl_spark.operators.asof import range_join

    left = spark.createDataFrame([(1, 100, 200, "a"), (1, 500, 550, "b")],
                                 ["k", "lo", "hi", "tag"])
    right = spark.createDataFrame(
        [(1, 100), (1, 150), (1, 200), (1, 201), (1, 499), (1, 550), (2, 150)],
        ["k", "p"],
    )
    out = (
        range_join(left, right, ["k"], "lo", "hi", "p", bucket_width=50)
        .groupBy("tag")
        .count()
        .collect()
    )
    counts = {r.tag: r["count"] for r in out}
    # a: 100,150,200 inclusive; b: 550 only (499 outside, k=2 excluded)
    assert counts == {"a": 3, "b": 1}
