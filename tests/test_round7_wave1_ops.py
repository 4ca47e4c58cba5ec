"""Round-7 wave-1 operators: banded NW/SW sequence alignment
(operators/align.py) pinned against an independent full-matrix
pure-Python reference, and the KLL/MRL deterministic-compaction
quantile sketch (operators/kll.py) — error-bound certification,
mergeability law, size bound."""

from __future__ import annotations

import numpy as np
import pytest

from owl_etl_spark.operators.align import _align_band, align_pairs
from owl_etl_spark.operators.kll import KLL, kll_merge_rows, kll_partition_sketches


# ------------------------------------------------------- pure-Python refs


def ref_nw(a, b, match=2, mismatch=-1, gap=-2):
    """Independent full-matrix Needleman-Wunsch (no banding, no
    numpy) — the oracle the banded DP must equal when band covers the
    whole matrix."""
    n, m = len(a), len(b)
    D = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        D[i][0] = i * gap
    for j in range(1, m + 1):
        D[0][j] = j * gap
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = match if a[i - 1] == b[j - 1] else mismatch
            D[i][j] = max(D[i - 1][j - 1] + s, D[i - 1][j] + gap, D[i][j - 1] + gap)
    return D[n][m]


def ref_sw(a, b, match=2, mismatch=-1, gap=-2):
    """Independent full-matrix Smith-Waterman."""
    n, m = len(a), len(b)
    S = [[0] * (m + 1) for _ in range(n + 1)]
    best = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = match if a[i - 1] == b[j - 1] else mismatch
            S[i][j] = max(0, S[i - 1][j - 1] + s, S[i - 1][j] + gap, S[i][j - 1] + gap)
            best = max(best, S[i][j])
    return best


# ------------------------------------------------------------- _align_band


def test_align_matches_full_matrix_reference_randomized():
    rng = np.random.default_rng(11)
    for trial in range(25):
        n, m = rng.integers(1, 40, size=2)
        a = rng.integers(0, 5, size=n).astype(np.int64)
        b = rng.integers(0, 5, size=m).astype(np.int64)
        band = max(int(n), int(m))  # full-matrix band -> exact
        nw, sw = _align_band(a, b, band, 2, -1, -2)
        assert nw == ref_nw(list(a), list(b)), f"NW trial {trial}"
        assert sw == ref_sw(list(a), list(b)), f"SW trial {trial}"


def test_align_identical_and_disjoint():
    a = np.array([1, 2, 3, 4], dtype=np.int64)
    nw, sw = _align_band(a, a, 4, 2, -1, -2)
    assert nw == 8 and sw == 8  # 4 matches x 2
    b = np.array([9, 8, 7, 6], dtype=np.int64)
    nw, sw = _align_band(a, b, 4, 2, -1, -2)
    assert nw == ref_nw([1, 2, 3, 4], [9, 8, 7, 6])
    assert sw == 0  # no positive local alignment exists


def test_align_band_narrower_than_length_gap_raises():
    a = np.arange(10, dtype=np.int64)
    b = np.arange(3, dtype=np.int64)
    with pytest.raises(ValueError, match="band"):
        _align_band(a, b, 2, 2, -1, -2)


def test_banded_run_is_exact_when_alignment_stays_in_band():
    # same-length sequences, one substitution: optimal path hugs the
    # diagonal, so even band=1 must reproduce the full-matrix score
    a = list(range(30))
    b = list(range(30))
    b[7] = 99
    nw_full = ref_nw(a, b)
    nw, sw = _align_band(
        np.array(a, dtype=np.int64), np.array(b, dtype=np.int64), 1, 2, -1, -2
    )
    assert nw == nw_full
    assert sw == ref_sw(a, b)


def test_align_pairs_spark_end_to_end(spark):
    rows = []
    seqs = {
        "a": [1, 2, 3, 4, 5, 6],
        "b": [1, 2, 9, 4, 5, 6],   # one substitution vs a
        "c": [7, 8, 7, 8],         # unrelated
    }
    for sid, vals in seqs.items():
        rows += [(sid, i, v) for i, v in enumerate(vals)]
    series = spark.createDataFrame(rows, "sid string, pos int, tok int")
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "id_a string, id_b string"
    )
    out = {
        (r.id_a, r.id_b): r
        for r in align_pairs(series, pairs, "sid", "pos", "tok", band=8).collect()
    }
    assert out[("a", "b")].nw_score == ref_nw(seqs["a"], seqs["b"])
    assert out[("a", "b")].sw_score == ref_sw(seqs["a"], seqs["b"])
    assert out[("a", "c")].nw_score == ref_nw(seqs["a"], seqs["c"])
    assert out[("b", "c")].sw_score == ref_sw(seqs["b"], seqs["c"])
    assert out[("a", "b")].len_a == 6 and out[("a", "c")].len_b == 4


def test_align_pairs_max_len_guard(spark):
    series = spark.createDataFrame(
        [("a", i, i) for i in range(10)] + [("b", 0, 1)],
        "sid string, pos int, tok int",
    )
    pairs = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    with pytest.raises(Exception, match="max_len"):
        align_pairs(series, pairs, "sid", "pos", "tok", band=16, max_len=5).collect()


# -------------------------------------------------------------------- KLL


def _true_rank(data, v):
    return int(np.sum(np.asarray(data) < v))


def test_kll_certified_bound_holds_exhaustively():
    rng = np.random.default_rng(3)
    data = rng.integers(-(10**9), 10**9, size=60_000).astype(np.int64)
    sk = KLL(k=128)
    for chunk in np.array_split(data, 7):
        sk.update_many(chunk)
    assert sk.n == data.size
    for p_bp in (100, 500, 2500, 5000, 7500, 9500, 9900):
        est = sk.quantile(p_bp)
        target = data.size * p_bp // 10_000
        assert abs(_true_rank(data, est) - target) <= 2 * sk.err + 1, p_bp


def test_kll_small_input_is_exact():
    sk = KLL(k=64)
    sk.update_many(np.arange(50, dtype=np.int64))
    assert sk.err == 0  # no compaction -> zero certified error
    assert sk.quantile(5000) == 25  # rank 25 exactly


def test_kll_merge_law_bound_composes():
    rng = np.random.default_rng(9)
    a = rng.integers(0, 10**6, size=30_000).astype(np.int64)
    b = rng.integers(5 * 10**5, 2 * 10**6, size=40_000).astype(np.int64)
    ska, skb = KLL(k=128), KLL(k=128)
    ska.update_many(a)
    skb.update_many(b)
    err_before = ska.err + skb.err
    merged = ska.merge(skb)
    assert merged.n == 70_000
    assert merged.err >= err_before  # only grows by new compactions
    allv = np.concatenate([a, b])
    for p_bp in (1000, 5000, 9000):
        est = merged.quantile(p_bp)
        target = allv.size * p_bp // 10_000
        assert abs(_true_rank(allv, est) - target) <= 2 * merged.err + 1


def test_kll_size_stays_logarithmic():
    sk = KLL(k=64)
    rng = np.random.default_rng(1)
    sk.update_many(rng.integers(0, 10**9, size=200_000).astype(np.int64))
    # uniform-capacity MRL bound: (levels+1) * k items
    assert sk.size_items() <= (len(sk.levels) + 1) * sk.k
    assert len(sk.levels) <= 20


def test_kll_spark_partition_sketches_and_merge(spark):
    from pyspark.sql import functions as F

    df = spark.range(0, 100_000, 1, 8).select(F.col("id").alias("v"))
    sks = kll_partition_sketches(df, "v", k=256).collect()
    assert len(sks) == 8  # one row per partition
    merged = kll_merge_rows(sks)
    assert merged.n == 100_000
    est = merged.quantile(5000)
    assert abs(est - 50_000) <= 2 * merged.err + 1


def test_kll_empty_raises():
    with pytest.raises(ValueError, match="empty"):
        KLL(k=64).quantile(5000)
