"""Quantile-bucket assignment at scale: cutpoints + broadcast bucketing.

q70/q96/q99 assign deciles with ``ntile()`` over an unpartitioned
ORDER BY — a single-task global sort, viable only because the fact
table is pre-aggregated to |customers| rows first (r2 VERDICT "What's
wrong" #3). At billions of KEYS the sort itself becomes the
bottleneck. The scalable shape decouples the two jobs ntile fuses:

1. **cutpoints** — the k-1 bucket boundary values.
   - ``exact_rank_cutpoints``: nearest-rank boundaries from a
     cumulative count over the DISTINCT values. Integer-only rank
     arithmetic (``ceil(d·n/k)`` as ``(d·n + k - 1) div k``) makes the
     boundaries bit-identical across engines — this is the
     oracle-gated form (q100). The cum-count window is a single-task
     sort over |distinct values| (not |rows|); fine while the value
     domain is materially smaller than the key count, e.g. prices,
     scores, bounded integer metrics.
   - ``approx_cutpoints``: one-pass ``percentile_approx`` sketch, KBs
     of state, no sort anywhere — the 100 TB form. Rank error ≤
     n/accuracy; agreement with the exact form away from boundary
     ties is pinned by test.
2. **assignment** — ``assign_buckets``: the k-1 cutpoints (a
   config-sized list, collected to the driver like a broadcast dim)
   compile into a literal comparison chain: bucket(x) =
   1 + Σ_d [cut_d < x]. Pure whole-stage codegen, zero shuffle, no
   sort, embarrassingly parallel — this is what replaces the global
   ntile window at scale.

Bucket semantics: values ≤ cut_d fall in bucket ≤ d; rows TIED on a
cutpoint value all land in the LOWER bucket (deterministic under any
row order). ntile instead splits equal values across buckets by sort
position to equalize bucket sizes, and front-loads remainder rows when
n % k ≠ 0 — so the two agree exactly iff values on the boundaries are
untied and n % k == 0 (pinned by test); otherwise they differ only at
boundaries, never by more than one bucket.

Reference parity: the reference has no quantile operator at all
(SURVEY §2.5 "not present"); this generalizes the report-bucketing
surface (A5) the way q70/q96/q99 do, with a plan that survives the
100x scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_rank_cutpoints(df: DataFrame, value_col: str, k: int) -> DataFrame:
    """1-row DataFrame with ``cutpoints``: array of the k-1 exact
    nearest-rank bucket boundaries of ``value_col``.

    cut_d = min{v : |rows with value ≤ v| ≥ ceil(d·n/k)} — pure
    integer rank arithmetic, no interpolation, so any engine computes
    the identical boundary. Cost: one groupBy over distinct values +
    a single-task cumulative window over |distinct| rows + one final
    k-1-column aggregate. Use ``approx_cutpoints`` when the value
    domain is not materially smaller than the row count.
    """
    vals = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("__c"))
    w = (
        Window.orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = vals.withColumn("__cum", F.sum("__c").over(w))
    total = df.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    cum = cum.crossJoin(F.broadcast(total))
    aggs = [
        F.min(
            F.when(
                F.col("__cum") >= F.expr(f"({d} * __n + {k - 1}) div {k}"),
                F.col(value_col),
            )
        ).alias(f"__cut{d}")
        for d in range(1, k)
    ]
    return cum.agg(*aggs).select(
        F.array(*[f"__cut{d}" for d in range(1, k)]).alias("cutpoints")
    )


def approx_cutpoints(
    df: DataFrame, value_col: str, k: int, accuracy: int = 10000
) -> DataFrame:
    """1-row DataFrame with ``cutpoints``: k-1 approximate boundaries
    from the GK sketch (``percentile_approx``). One pass, mergeable
    partials, no sort — rank error ≤ n/accuracy. The sketch returns
    actual data values, so with accuracy ≥ n it degenerates to the
    exact nearest-rank boundaries."""
    probs = F.array(*[F.lit(d / k) for d in range(1, k)])
    return df.agg(
        F.percentile_approx(value_col, probs, F.lit(accuracy)).alias("cutpoints")
    )


def collect_cutpoints(cuts_df: DataFrame) -> list:
    """Materialize the cutpoint array (k-1 scalars — config-sized, the
    same driver round-trip a broadcast dimension pays)."""
    return list(cuts_df.collect()[0]["cutpoints"])


def assign_buckets(
    df: DataFrame, value_col: str, cutpoints: list, bucket_col: str = "bucket"
) -> DataFrame:
    """Attach ``bucket_col`` (1..len(cutpoints)+1, BIGINT): bucket(x) =
    1 + |{c in cutpoints : c < x}|. The cutpoints compile to a literal
    comparison chain — whole-stage codegen, zero shuffle, map-side
    only."""
    expr = F.lit(1)
    for c in cutpoints:
        expr = expr + F.when(F.lit(c) < F.col(value_col), 1).otherwise(0)
    return df.withColumn(bucket_col, expr.cast("long"))
