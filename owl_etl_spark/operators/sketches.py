"""Mergeable distinct-count sketches (Apache DataSketches HLL via
Spark built-ins).

The scale pattern: exact COUNT(DISTINCT) over 100 TB needs a full
shuffle of every key occurrence; a sketch needs one pass and a few KB
per group. Crucially HLL sketches are *mergeable*: persist one sketch
per partition/day/month as it lands (the engine's monthly-drop
contract), then answer "distinct over any date range" by unioning
sketch bytes — no rescan of history. Note: a sketch built in one shot
keeps the HIP estimator while a union falls back to the composite
estimator (DataSketches semantics), so incremental and one-shot
estimates agree to within the sketch's error bound, not bit-for-bit.

The reference has no approximate aggregates (SURVEY §2.5 "not
present"); this is part of the engine's beyond-reference surface
(exact forms: q44 distinct-agg; error-bound-tested approx: q53).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketch(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """One HLL sketch per key group over ``value_col`` (binary column
    ``sketch``). Partial aggregation applies — each map task emits one
    sketch per group, the shuffle moves KBs."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )


def merge_sketches(df: DataFrame, keys: list[str]) -> DataFrame:
    """Union sketches across a finer partitioning (e.g. per-month →
    per-year): ``hll_union_agg`` merges sketch bytes, never raw data."""
    return df.groupBy(*keys).agg(F.hll_union_agg("sketch").alias("sketch"))


def estimate(sketch_col: str = "sketch") -> Column:
    """Distinct-count estimate from a sketch column (BIGINT)."""
    return F.hll_sketch_estimate(sketch_col)


def distinct_overlap_estimate(
    df: DataFrame,
    key_col: str,
    cond_a: Column,
    cond_b: Column,
    lg_k: int = 12,
) -> DataFrame:
    """Audience-overlap estimation via HLL set algebra, ONE pass:
    sketch the keys satisfying ``cond_a`` and ``cond_b`` (null keys
    are skipped by the sketch), union the sketches, and estimate
    |A∩B| = est(A) + est(B) - est(A∪B) (inclusion–exclusion).

    The 100 TB shape: one scan, two lg_k-sized sketches per map task,
    KBs over the wire — vs the exact form's full shuffle of every
    (key, membership) pair. The intersection estimate inherits error
    from THREE estimates, each with rsd ≈ 1.04/√2^lg_k of its OWN
    cardinality — so the practical error bound scales with |A∪B|, not
    |A∩B|; small overlaps of large sets need a bigger lg_k (or exact
    confirmation on the shortlisted segments). Sketches here are
    mergeable like everything in this module: per-partition/day
    sketches roll up without rescans."""
    sa = F.hll_sketch_agg(F.when(cond_a, F.col(key_col)), F.lit(lg_k))
    sb = F.hll_sketch_agg(F.when(cond_b, F.col(key_col)), F.lit(lg_k))
    return df.agg(sa.alias("__sa"), sb.alias("__sb")).select(
        F.hll_sketch_estimate("__sa").alias("est_a"),
        F.hll_sketch_estimate("__sb").alias("est_b"),
        F.hll_sketch_estimate(F.expr("hll_union(__sa, __sb)")).alias("est_union"),
        (
            F.hll_sketch_estimate("__sa")
            + F.hll_sketch_estimate("__sb")
            - F.hll_sketch_estimate(F.expr("hll_union(__sa, __sb)"))
        ).alias("est_intersection"),
    )
