"""Round-7 wave-4 operators: vocabulary growth (corpusstats.py),
Misra-Gries heavy hitters (sketches.py — including the approximate
dec > 0 regime the gate query can't exercise), IPS/SNIPS policy
evaluation (policy_eval.py)."""

from __future__ import annotations

from collections import Counter

import pytest

from pyspark.sql import functions as F

from owl_etl_spark.operators.corpusstats import vocabulary_growth
from owl_etl_spark.operators.policy_eval import ips_policy_value
from owl_etl_spark.operators.sketches import (
    MisraGries,
    misra_gries_merge_rows,
    misra_gries_partition_sketches,
    misra_gries_report,
)


# ------------------------------------------------------- vocabulary growth


def test_vocab_growth_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "d d d"), (4, "a b c d")],
        "doc_id int, text string",
    )
    out = {r.milestone: r for r in vocabulary_growth(docs, "doc_id", "text", 4).collect()}
    assert (out[1].docs_cum, out[1].tokens_cum, out[1].vocab_cum) == (1, 2, 2)
    assert (out[2].docs_cum, out[2].tokens_cum, out[2].vocab_cum) == (2, 4, 3)
    assert (out[3].docs_cum, out[3].tokens_cum, out[3].vocab_cum) == (3, 7, 4)
    assert (out[4].docs_cum, out[4].tokens_cum, out[4].vocab_cum) == (4, 11, 4)


def test_vocab_growth_monotone_and_gap_tolerant(spark):
    # sparse, gappy doc ids: dense_rank keeps milestones meaningful
    docs = spark.createDataFrame(
        [(10, "x"), (200, "x y"), (3000, "z"), (40000, "w w")],
        "doc_id int, text string",
    )
    out = vocabulary_growth(docs, "doc_id", "text", 2).collect()
    assert [r.docs_cum for r in out] == [2, 4]
    assert [r.vocab_cum for r in out] == [2, 4]
    assert out[0].tokens_cum <= out[1].tokens_cum


# ----------------------------------------------------------- Misra-Gries


def test_mg_exact_when_under_capacity():
    sk = MisraGries(k=8)
    sk.update_many(["a"] * 5 + ["b"] * 3 + ["c"])
    assert sk.dec == 0 and sk.counts == {"a": 5, "b": 3, "c": 1}


def test_mg_bound_holds_adversarial_stream():
    # k=2 over a 4-symbol stream engineered to force many decrements
    stream = (["a", "b", "c", "d"] * 50) + ["a"] * 40
    sk = MisraGries(k=2)
    sk.update_many(stream)
    true = Counter(stream)
    assert sk.dec > 0
    assert sk.dec <= len(stream) // 3  # n/(k+1)
    for item, cnt in sk.counts.items():
        assert cnt <= true[item] <= cnt + sk.dec
    for item in true:
        if item not in sk.counts:
            assert true[item] <= sk.dec  # missed => provably light


def test_mg_merge_law_certified():
    a = ["x"] * 60 + ["y"] * 30 + list("abcdefghij") * 3
    b = ["x"] * 20 + ["z"] * 50 + list("klmnopqrst") * 4
    ska, skb = MisraGries(k=4), MisraGries(k=4)
    ska.update_many(a)
    skb.update_many(b)
    merged = ska.merge(skb)
    true = Counter(a + b)
    assert merged.n == len(a) + len(b)
    for item, cnt in merged.counts.items():
        assert cnt <= true[item] <= cnt + merged.dec, item
    for item in true:
        if item not in merged.counts:
            assert true[item] <= merged.dec, item
    assert len(merged.counts) <= merged.k


def test_mg_spark_report_contract_columns(spark):
    rows = [("hot",)] * 500 + [(f"t{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string").repartition(8)
    out = misra_gries_report(df, "v", k=16, top=5).collect()
    assert out[0].item == "hot"
    assert all(r.within_bound for r in out)
    assert all(r.no_missed_heavy for r in out)
    assert out[0].n == 700


def test_mg_partition_sketches_shape(spark):
    df = spark.range(0, 1000, 1, 4).select(
        (F.col("id") % 7).cast("string").alias("v")
    )
    sks = misra_gries_partition_sketches(df, "v", k=8).collect()
    assert len(sks) == 4
    merged = misra_gries_merge_rows(sks)
    assert merged.n == 1000 and merged.dec == 0  # 7 distinct < k


# ------------------------------------------------------------- IPS / SNIPS


def test_ips_full_coverage_equals_snips(spark):
    logs = spark.createDataFrame(
        [("x1", "a", 100), ("x1", "b", 50), ("x2", "a", 200), ("x2", "b", 10)],
        "ctx string, act string, r long",
    )
    out = {r.action: r for r in ips_policy_value(logs, "ctx", "act", "r").collect()}
    # both actions cover both contexts -> estimators agree
    assert out["a"].ips_micro == out["a"].snips_micro
    # action a: ctx x1: fd(100*2,1)=200; ctx x2: fd(200*2,1)=400 ->
    # num=600, N=4 -> 600/4 = 150 reward units
    assert out["a"].ips_micro == 150 * 1_000_000
    assert out["a"].contexts_covered == 2 and out["a"].contexts_total == 2


def test_ips_partial_coverage_separates_estimators(spark):
    logs = spark.createDataFrame(
        [("x1", "a", 100), ("x1", "b", 80), ("x2", "b", 60), ("x2", "b", 40)],
        "ctx string, act string, r long",
    )
    out = {r.action: r for r in ips_policy_value(logs, "ctx", "act", "r").collect()}
    # action a appears only in x1 (nx=2, nax=1): num = fd(100*2,1)=200
    # IPS = 200/4 = 50; SNIPS = 200/2 = 100 — coverage gap exposed
    assert out["a"].ips_micro == 50 * 1_000_000
    assert out["a"].snips_micro == 100 * 1_000_000
    assert out["a"].contexts_covered == 1 and out["a"].contexts_total == 2


def test_ips_matches_row_level_float_reference(spark):
    import random

    rnd = random.Random(3)
    rows = [
        (f"x{rnd.randrange(4)}", rnd.choice("abc"), rnd.randrange(1, 500))
        for _ in range(400)
    ]
    logs = spark.createDataFrame(rows, "ctx string, act string, r long")
    out = {r.action: r for r in ips_policy_value(logs, "ctx", "act", "r").collect()}
    # float reference: IPS = (1/N) sum r / (nax/nx) over matched rows
    from collections import defaultdict

    nax = Counter((c, a) for c, a, _ in rows)
    nx = Counter(c for c, _, _ in rows)
    N = len(rows)
    for act in "abc":
        ref = sum(r * nx[c] / nax[(c, a)] for c, a, r in rows if a == act) / N
        got = out[act].ips_micro / 1e6
        assert abs(got - ref) < 1.0, (act, got, ref)  # floor-div quantum
