"""Round-7 wave-6 operators: negative sampling (negatives.py),
harmonic centrality (graph.py), streaming near-dup band counts
(streaming/dedup_stream.py)."""

from __future__ import annotations

import pytest

# r13 test tiering (VERDICT r12 #2): this suite runs in the FULL tier
# (tools/round_close.py --full-tests); the default time-boxed tier
# excludes it so the driver's verification window completes.
pytestmark = pytest.mark.full

from pyspark.sql import functions as F

from owl_etl_spark.operators.graph import harmonic_centrality
from owl_etl_spark.operators.negatives import negative_samples


# ------------------------------------------------------ negative sampling


def _pos(spark):
    rows = [
        ("u1", "a"), ("u1", "b"),
        ("u2", "a"),
        ("u3", "a"), ("u3", "b"), ("u3", "c"), ("u3", "d"),
    ]
    return spark.createDataFrame(rows, "user string, item string")


def test_negatives_never_collide_with_positives(spark):
    pos = _pos(spark)
    out = negative_samples(pos, "user", "item", m=2).collect()
    pos_set = {(r.user, r.item) for r in pos.collect()}
    for r in out:
        assert (r.user, r.item) not in pos_set
        assert 1 <= r.neg_rank <= 2


def test_negatives_deterministic_under_repartition(spark):
    pos = _pos(spark)
    a = sorted((r.user, r.item, r.neg_rank) for r in negative_samples(pos, "user", "item", m=2).collect())
    b = sorted(
        (r.user, r.item, r.neg_rank)
        for r in negative_samples(pos.repartition(5, "item"), "user", "item", m=2).collect()
    )
    assert a == b


def test_negatives_saturated_user_gets_fewer(spark):
    # u3 owns 4 of the 5 items: at most 1 valid negative exists
    rows = [("u3", x) for x in "abcd"] + [("u9", "e")]
    pos = spark.createDataFrame(rows, "user string, item string")
    out = [r for r in negative_samples(pos, "user", "item", m=3).collect() if r.user == "u3"]
    assert len(out) <= 1
    if out:
        assert out[0].item == "e"


def test_negatives_dedup_keeps_earliest_attempt(spark):
    pos = _pos(spark)
    out = negative_samples(pos, "user", "item", m=3, attempts_per_negative=8).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user, []).append(r)
    for rs in per_user.values():
        items = [r.item for r in rs]
        assert len(items) == len(set(items))  # no duplicate negatives
        ranks = sorted(r.neg_rank for r in rs)
        assert ranks == list(range(1, len(ranks) + 1))


def test_negatives_m_guard(spark):
    with pytest.raises(ValueError, match="m must be"):
        negative_samples(_pos(spark), "user", "item", m=0)


# ---------------------------------------------------- harmonic centrality


def test_harmonic_hand_computed_path_graph(spark):
    # a -> b -> c: H(a) = 1/1 + 1/2, H(b) = 1, H(c) = 0
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "node string")
    out = {r.node: r for r in harmonic_centrality(edges, nodes).collect()}
    assert out["a"].harmonic_micro == 1_000_000 + 500_000
    assert out["a"].n_reached == 2
    assert out["b"].harmonic_micro == 1_000_000
    assert out["c"].harmonic_micro == 0 and out["c"].n_reached == 0


def test_harmonic_cycle_symmetric(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "node string")
    out = {r.node: r.harmonic_micro for r in harmonic_centrality(edges, nodes).collect()}
    assert len(set(out.values())) == 1  # symmetric by rotation
    assert out["a"] == 1_000_000 + 500_000


def test_harmonic_max_hops_truncates(spark):
    # path of length 3 with max_hops=1: only direct neighbors count
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    nodes = spark.createDataFrame([(x,) for x in "abcd"], "node string")
    out = {r.node: r for r in harmonic_centrality(edges, nodes, max_hops=1).collect()}
    assert out["a"].n_reached == 1 and out["a"].harmonic_micro == 1_000_000


def test_harmonic_node_guard(spark):
    import owl_etl_spark.operators.graph as g

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    nodes = spark.createDataFrame([("a",), ("b",)], "node string")
    old = g._HARMONIC_MAX_NODES
    g._HARMONIC_MAX_NODES = 1
    try:
        with pytest.raises(ValueError, match="contract the graph"):
            harmonic_centrality(edges, nodes)
    finally:
        g._HARMONIC_MAX_NODES = old


# ------------------------------------------- streaming near-dup monitor


def test_streaming_near_dup_matches_batch(spark, tmp_path):
    from owl_etl_spark.streaming.dedup_stream import streaming_near_dup_band_counts
    from owl_etl_spark.operators.dedup import with_minhash

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
        (3, "a completely different document about spark"),
        (4, "the quick brown fox jumps over the sleepy dog"),  # near dup
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    path = str(tmp_path / "docs")
    df.coalesce(1).write.mode("overwrite").parquet(path)

    src = spark.readStream.schema("doc_id long, text string").parquet(path)
    agg = streaming_near_dup_band_counts(src, "doc_id", "text", 16, 8)
    q = (
        agg.writeStream.format("memory")
        .queryName("near_dup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.band, r.sig): (r.n_docs, r.min_doc_id)
           for r in spark.table("near_dup_test").collect()}

    # batch reference through the same library hashing
    sig = with_minhash(df, "text", 16)
    batch = (
        sig.select(
            "doc_id", "minhash",
            F.explode(F.expr("sequence(0, 7)")).alias("band"),
        )
        .select(
            "doc_id", "band",
            F.expr(
                "array_join(transform(slice(minhash, band * 2 + 1, 2),"
                " h -> cast(h as string)), '_')"
            ).alias("sig"),
        )
        .groupBy("band", "sig")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("mn"))
    )
    want = {(r.band, r.sig): (r.n, r.mn) for r in batch.collect()}
    assert got == want
    # exact duplicates share every band; doc 1 is the representative
    dup_buckets = [v for v in got.values() if v[0] >= 2 and v[1] == 1]
    assert len(dup_buckets) >= 8
    spark.catalog.dropTempView("near_dup_test")
