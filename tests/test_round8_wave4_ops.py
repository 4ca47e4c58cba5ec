"""Round-8 wave-4 operators: streaming CMS / streaming HLL
(streaming/sketch_stream.py) and seeded truncated betweenness
(graph.betweenness_seeded). Streaming sketches are pinned by the
state ≡ batch-sketch law (order-independent folds on bounded input);
betweenness against a pure-Python Brandes replica plus the known
answer on a path graph.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from owl_etl_spark.operators.graph import betweenness_seeded
from owl_etl_spark.operators.logreg import _round_half_away
from owl_etl_spark.operators.sketches import cms_build
from owl_etl_spark.streaming.sketch_stream import (
    hll_register_exprs,
    hll_registers_estimate,
    streaming_hll,
)


# ------------------------------------------------- streaming cms / hll

def test_streaming_cms_state_equals_batch_sketch(spark, tmp_path):
    df = spark.range(5000).select((F.col("id") % 37).alias("k"))
    src_dir = str(tmp_path / "cms_src")
    df.coalesce(2).write.parquet(src_dir)
    from owl_etl_spark.streaming.sketch_stream import streaming_cms

    stream = spark.readStream.schema("k long").parquet(src_dir)
    q = (
        streaming_cms(stream, "k", depth=4, width=64)
        .writeStream.format("memory")
        .queryName("t_cms_state")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.table("t_cms_state").collect()))
    want = sorted(
        map(tuple, cms_build(df, "k", depth=4, width=64).collect())
    )
    spark.catalog.dropTempView("t_cms_state")
    assert got == want


def test_streaming_hll_state_equals_batch_and_estimates(spark, tmp_path):
    # two groups with known distinct counts: group a sees even ids mod
    # 1000 (= 500 distinct evens), group b odd ids mod 150 (= 75
    # distinct odds — an even modulus preserves parity)
    df = spark.range(20_000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
        F.when(F.col("id") % 2 == 0, F.col("id") % 1000)
        .otherwise(F.col("id") % 150)
        .alias("k"),
    )
    src_dir = str(tmp_path / "hll_src")
    df.coalesce(3).write.parquet(src_dir)
    stream = spark.readStream.schema("g string, k long").parquet(src_dir)
    q = (
        streaming_hll(stream, ["g"], "k", p=8)
        .writeStream.format("memory")
        .queryName("t_hll_state")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state = spark.table("t_hll_state")
    # state == batch construction of the same registers
    reg, rho = hll_register_exprs("k", 8)
    batch = (
        df.select("g", reg, rho)
        .groupBy("g", "register")
        .agg(F.max("rho").cast("long").alias("max_rho"))
    )
    assert sorted(map(tuple, state.collect())) == sorted(map(tuple, batch.collect()))
    est = {
        r["g"]: r["est_distinct"]
        for r in hll_registers_estimate(state, ["g"], p=8).collect()
    }
    spark.catalog.dropTempView("t_hll_state")
    # HLL with m=256: rsd ~ 6.5%; allow ~3 sigma
    assert abs(est["a"] - 500) < 100, est
    assert abs(est["b"] - 75) < 25, est


def test_hll_estimator_exact_small_linear_counting(spark):
    # tiny set: linear counting regime, est = round(m * ln(m / V))
    df = spark.range(5).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    reg, rho = hll_register_exprs("k", 8)
    regs = (
        df.select("g", reg, rho)
        .groupBy("g", "register")
        .agg(F.max("rho").cast("long").alias("max_rho"))
    )
    got = hll_registers_estimate(regs, ["g"], p=8).collect()[0]
    n_regs = got["n_registers"]
    want = round(256.0 * math.log(256.0 / (256 - n_regs)))
    assert got["est_distinct"] == want
    assert 1 <= n_regs <= 5


def test_hll_estimator_mid_band_uses_raw_despite_empty_registers(spark):
    # 250 of 256 registers present (V=6 > 0) but all at rho=4: the raw
    # harmonic estimate (~2800) is far above the 2.5*m=640 cutoff, so
    # the dual estimator must return RAW, not linear counting (~961) —
    # the mid-cardinality band where LC is the less accurate of the two.
    # The harmonic sum must count the 6 EMPTY registers at 2^-0 = 1
    # each (6*2^50 units) alongside the 250 present ones at 2^-4.
    regs = spark.range(250).select(
        F.lit("g").alias("g"),
        F.col("id").alias("register"),
        F.lit(4).cast("long").alias("max_rho"),
    )
    got = hll_registers_estimate(regs, ["g"], p=8).collect()[0]
    alpha = 0.7213 / (1.0 + 1.079 / 256)
    s_full = 250.0 * float(1 << 46) + 6.0 * float(1 << 50)
    want_raw = round(alpha * 256.0 * 256.0 * float(1 << 50) / s_full)
    assert got["n_registers"] == 250
    assert got["est_distinct"] == want_raw
    assert want_raw > 640  # sanity: this case is genuinely past the cutoff


# ---------------------------------------------------------- betweenness

def _py_brandes_truncated(edges, seeds, levels):
    """Pure-Python replica of the exact truncated recurrence."""
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    out: dict = {}
    for s in seeds:
        lvl = {0: {s: 1}}
        visited = {s}
        for l in range(1, levels + 1):
            nxt: dict = {}
            for v, sig in lvl[l - 1].items():
                for w in adj.get(v, []):
                    if w not in visited:
                        nxt[w] = nxt.get(w, 0) + sig
            nxt = {w: c for w, c in nxt.items() if w not in visited}
            visited |= set(nxt)
            lvl[l] = nxt
        delta = {w: 0 for w in lvl[levels]}
        for l in range(levels - 1, -1, -1):
            cur: dict = {}
            for v, sig in lvl[l].items():
                total = 0
                for w in adj.get(v, []):
                    if w in lvl[l + 1]:
                        total += _round_half_away(
                            float(sig) * float(1_000_000 + delta[w]) / float(lvl[l + 1][w])
                        )
                cur[v] = total
            delta_next = delta
            delta = cur
            for w, dv in delta_next.items():
                if w != s:
                    out[w] = out.get(w, 0) + dv
        for v, dv in delta.items():
            if v != s:
                out[v] = out.get(v, 0) + dv
    return {v: d for v, d in out.items() if d > 0}


def test_betweenness_path_graph_center_dominates(spark):
    # path 0-1-2-3-4: node 2 lies on the most seed-pair shortest paths
    und = [(i, i + 1) for i in range(4)]
    edges = und + [(b, a) for a, b in und]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(i,) for i in range(5)], "node long")
    got = {r["node"]: r["betweenness_micro"]
           for r in betweenness_seeded(e, seeds, n_levels=4).collect()}
    assert got[2] == max(got.values())
    assert got[2] > got[1] > 0 and got[3] == got[1]


def test_betweenness_matches_python_replica(spark):
    # two triangles joined by a bridge through node 10
    und = [(0, 1), (1, 2), (2, 0), (2, 10), (10, 5), (5, 6), (6, 7), (7, 5)]
    edges = und + [(b, a) for a, b in und]
    nodes = sorted({v for p in edges for v in p})
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(v,) for v in nodes], "node long")
    got = {r["node"]: r["betweenness_micro"]
           for r in betweenness_seeded(e, seeds, n_levels=3).collect()}
    want = _py_brandes_truncated(edges, nodes, 3)
    assert got == want
    # only the bridge (10) and its triangle anchors (2, 5) lie on
    # cross-component shortest paths; the bridge dominates
    assert set(got) == {2, 5, 10}
    assert got[10] == max(got.values())
