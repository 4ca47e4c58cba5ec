"""Round-7 wave-13 operators: linear CKA (embdrift.py), table content
fingerprints (fingerprint.py), Jensen-Shannon divergence (drift.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from owl_etl_spark.operators.drift import jsd_pairs
from owl_etl_spark.operators.embdrift import linear_cka
from owl_etl_spark.operators.fingerprint import table_fingerprint


# --------------------------------------------------------------------- CKA


def _emb_df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cka_self_is_one(spark):
    rng = np.random.default_rng(3)
    df = _emb_df(spark, rng.normal(size=(50, 64)))
    assert linear_cka(df, df).collect()[0].cka == 1.0


def test_cka_rotation_invariant(spark):
    rng = np.random.default_rng(4)
    X = rng.normal(size=(80, 64))
    Q, _ = np.linalg.qr(rng.normal(size=(64, 64)))
    a = _emb_df(spark, X)
    b = _emb_df(spark, X @ Q)
    base = linear_cka(a, a).collect()[0].cka
    rotated = linear_cka(a, b).collect()[0].cka
    # rotating ONE side changes the covariance orientation, so the
    # score drops — while scaling (isotropic) must NOT change it
    c = _emb_df(spark, X * 3.0)
    scaled = linear_cka(a, c).collect()[0].cka
    assert base == 1.0
    assert scaled > 0.999
    assert rotated < scaled


def test_cka_unrelated_geometry_scores_low(spark):
    rng = np.random.default_rng(5)
    # a varies along dims 0..7 only; b along dims 32..39 only
    Xa = np.zeros((60, 64)); Xa[:, :8] = rng.normal(size=(60, 8)) * 5
    Xb = np.zeros((60, 64)); Xb[:, 32:40] = rng.normal(size=(60, 8)) * 5
    r = linear_cka(_emb_df(spark, Xa), _emb_df(spark, Xb)).collect()[0]
    assert r.cka < 0.2


# ------------------------------------------------------------- fingerprints


def test_fingerprint_order_and_partition_independent(spark):
    rows = [(i, f"v{i}") for i in range(500)]
    a = spark.createDataFrame(rows, "id long, v string")
    b = spark.createDataFrame(list(reversed(rows)), "id long, v string").repartition(13)
    fa = table_fingerprint(a, ["id", "v"], "t").collect()[0]
    fb = table_fingerprint(b, ["id", "v"], "t").collect()[0]
    assert fa.content_sum == fb.content_sum and fa.n_rows == fb.n_rows == 500


def test_fingerprint_detects_single_cell_change(spark):
    rows = [(i, f"v{i}") for i in range(100)]
    a = spark.createDataFrame(rows, "id long, v string")
    rows[50] = (50, "vX")
    b = spark.createDataFrame(rows, "id long, v string")
    fa = table_fingerprint(a, ["id", "v"], "t").collect()[0]
    fb = table_fingerprint(b, ["id", "v"], "t").collect()[0]
    assert fa.content_sum != fb.content_sum


def test_fingerprint_null_vs_empty_distinct(spark):
    a = spark.createDataFrame([(1, None)], "id long, v string")
    b = spark.createDataFrame([(1, "")], "id long, v string")
    fa = table_fingerprint(a, ["id", "v"], "t").collect()[0]
    fb = table_fingerprint(b, ["id", "v"], "t").collect()[0]
    assert fa.content_sum != fb.content_sum


def test_fingerprint_column_guard(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="columns"):
        table_fingerprint(df, [], "t")


# --------------------------------------------------------------------- JSD


def _tok_df(spark, dists):
    rows = []
    for k, toks in dists.items():
        rows += [(k, t) for t in toks]
    return spark.createDataFrame(rows, "k string, tok string")


def test_jsd_identical_zero_and_disjoint_ln2(spark):
    df = _tok_df(spark, {
        "a": ["x"] * 10 + ["y"] * 10,
        "b": ["x"] * 10 + ["y"] * 10,
        "c": ["z"] * 20,
    })
    out = {(r.key_a, r.key_b): r.jsd_micro_nats for r in jsd_pairs(df, "k", "tok").collect()}
    assert out[("a", "b")] == 0
    ln2 = round(math.log(2) * 1e6)
    assert abs(out[("a", "c")] - ln2) <= 2  # disjoint supports -> ln 2


def test_jsd_symmetric_in_construction(spark):
    df = _tok_df(spark, {"a": ["x"] * 7 + ["y"] * 3, "b": ["x"] * 3 + ["y"] * 7})
    out = jsd_pairs(df, "k", "tok").collect()[0]
    # reversed mixture weights: by symmetry JSD(P,Q) halves are equal
    ref = 0.0
    for p, q in ((0.7, 0.3), (0.3, 0.7)):
        ref += 0.5 * p * math.log(2 * p / (p + q)) + 0.5 * q * math.log(2 * q / (p + q))
    assert abs(out.jsd_micro_nats / 1e6 - ref) < 1e-3


def test_jsd_bounded_by_ln2(spark):
    import random

    rnd = random.Random(7)
    df = _tok_df(spark, {
        "a": [f"t{rnd.randrange(20)}" for _ in range(300)],
        "b": [f"t{rnd.randrange(25)}" for _ in range(200)],
    })
    out = jsd_pairs(df, "k", "tok").collect()[0]
    assert 0 <= out.jsd_micro_nats <= round(math.log(2) * 1e6) + 2
