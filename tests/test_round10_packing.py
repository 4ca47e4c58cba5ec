"""Greedy doc-boundary sequence packing (operators/packing.py —
round-10 wave 3): recurrence parity against an independent pure-Python
reference, oversize handling, shard independence, and the efficiency
report's exact-integer accounting."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from owl_etl_spark.operators.packing import greedy_pack, packing_efficiency


def _ref_pack(lens: list[int], capacity: int) -> list[int]:
    bins, b, fill = [], 0, 0
    for n in lens:
        if fill > 0 and fill + n > capacity:
            b, fill = b + 1, n
        else:
            fill += n
        bins.append(b)
    return bins


def _lens_df(spark, lens: list[int]):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(lens)], "doc_id long, n_tokens long"
    )


def test_matches_pure_python_reference_single_shard(spark):
    lens = [100, 900, 80, 50, 990, 10, 10, 2000, 1, 1024, 1023, 1, 1, 1]
    df = _lens_df(spark, lens)
    got = {
        r.doc_id: r.bin
        for r in greedy_pack(df, capacity=1024, shards=1).collect()
    }
    ref = _ref_pack(lens, 1024)
    assert [got[i] for i in range(len(lens))] == ref
    # the packing actually closed bins (non-vacuous)
    assert max(ref) >= 3


def test_oversize_doc_occupies_its_own_bin(spark):
    lens = [10, 5000, 10, 10]
    rows = {
        r.doc_id: r
        for r in greedy_pack(_lens_df(spark, lens), capacity=100, shards=1).collect()
    }
    assert rows[1].is_oversize and not rows[0].is_oversize
    # the oversize doc shares its bin with nobody
    assert rows[0].bin != rows[1].bin and rows[1].bin != rows[2].bin
    # docs after it pack normally
    assert rows[2].bin == rows[3].bin


def test_shards_pack_independently(spark):
    lens = [70] * 40
    out = greedy_pack(_lens_df(spark, lens), capacity=100, shards=4).collect()
    for r in out:
        assert r.shard == r.doc_id % 4
    # within each shard: 10 docs of 70 tokens, one per bin — the walk
    # saw only the shard's docs (a global walk would interleave)
    for s in range(4):
        shard_rows = sorted(
            (r for r in out if r.shard == s), key=lambda r: r.doc_id
        )
        assert [r.bin for r in shard_rows] == list(range(10))


def test_no_bin_except_oversize_exceeds_capacity(spark):
    lens = [(i * 37) % 400 + 1 for i in range(300)]
    out = greedy_pack(_lens_df(spark, lens), capacity=512, shards=8).collect()
    fills: dict[tuple, int] = {}
    for r in out:
        fills[(r.shard, r.bin)] = fills.get((r.shard, r.bin), 0) + r.n_tokens
    assert all(v <= 512 for v in fills.values())
    # bins are consecutive integers from 0 per shard
    for s in range(8):
        got = sorted({r.bin for r in out if r.shard == s})
        assert got == list(range(len(got)))


def test_efficiency_report_exact_accounting(spark):
    lens = [60, 60, 60, 250, 10]  # shard 0, cap 100:
    # walk: [60], [60], [60,10?]... order is doc_id: 60,60,60,250,10
    # bins: 0:[60], 1:[60], 2:[60], 3:[250 oversize], 4:[10]
    assign = greedy_pack(_lens_df(spark, lens), capacity=100, shards=1)
    rep = packing_efficiency(assign, capacity=100).collect()
    assert len(rep) == 1
    r = rep[0]
    assert (r.n_docs, r.total_tokens, r.bins_used, r.n_oversize) == (5, 440, 5, 1)
    assert r.lower_bound == (440 + 99) // 100
    # budget = 5*100 + (250-100) = 650; padding = 650-440 = 210
    assert r.padding_ppm == round((650 - 440) / 650 * 1_000_000)
    assert r.bins_used >= r.lower_bound


def test_validation(spark):
    df = _lens_df(spark, [1])
    with pytest.raises(ValueError, match="capacity"):
        greedy_pack(df, capacity=0)
    with pytest.raises(ValueError, match="shards"):
        greedy_pack(df, shards=0)


def test_report_invariants_on_corpus_shape(spark):
    lens = [(i * 131) % 1000 + 20 for i in range(500)]
    assign = greedy_pack(_lens_df(spark, lens), capacity=2048, shards=16)
    for r in packing_efficiency(assign, capacity=2048).collect():
        assert r.bins_used >= r.lower_bound
        assert 0 <= r.padding_ppm < 1_000_000
        assert r.n_oversize == 0
    # doc-boundary packing pays real padding; concat-split pays none:
    # total bins strictly above the concat lower bound somewhere
    tot = packing_efficiency(assign, capacity=2048).agg(
        F.sum("bins_used").alias("b"), F.sum("lower_bound").alias("lb")
    ).collect()[0]
    assert tot.b >= tot.lb
