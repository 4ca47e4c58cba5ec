"""Mergeable equi-width histogram sketch + interpolated quantiles.

The fixed-bin histogram is the workhorse mergeable quantile sketch:
unlike exact quantiles (``quantiles.weighted_quantiles``, a full sort
per group) the sketch is ONE map-side-combinable groupBy whose output
is ``keys × n_bins`` rows — droppable into incremental rollups (add
counts), cross-partition merges (add counts), and streaming state
(add counts). Accuracy is the usual histogram contract: the estimate
is exact at bin boundaries and linearly interpolated inside a bin, so
the error is bounded by one bin width.

Determinism discipline: bins, cumulative counts, and the
interpolation all stay in BIGINT — the interpolated offset is
``((need − cum_before)·10⁶ div bin_count)·width`` so no engine float
or floor/truncate divergence can move an estimate (operands
non-negative by construction). Out-of-range values clamp into the
edge bins (documented bias: a clamped tail compresses into its edge
bin — size [lo, hi] to cover the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_sketch(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lo: int,
    hi: int,
    n_bins: int,
) -> DataFrame:
    """The mergeable sketch: ``(keys..., bin, cnt)`` over equi-width
    bins of [lo, hi). ``hi − lo`` must divide evenly by ``n_bins`` (a
    ragged last bin would make interpolation lie). Null values are
    excluded (not a sample). Merging two sketches = unionByName +
    groupBy(keys, bin).sum(cnt) — pinned by test."""
    if n_bins < 1:
        raise ValueError(f"histogram_sketch: n_bins must be >= 1, got {n_bins}")
    if hi <= lo:
        raise ValueError(f"histogram_sketch: need hi > lo, got [{lo}, {hi})")
    if (hi - lo) % n_bins != 0:
        raise ValueError(
            f"histogram_sketch: bin width must be integral — "
            f"(hi - lo) = {hi - lo} is not divisible by n_bins = {n_bins}"
        )
    width = (hi - lo) // n_bins
    v = F.col(value_col).cast("long")
    bin_id = F.least(
        F.lit(n_bins - 1).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.expr(f"({value_col} - {lo}) div {width}")),
    )
    return (
        df.where(v.isNotNull())
        .groupBy(*keys, bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def histogram_quantile(
    sketch: DataFrame,
    keys: list[str],
    lo: int,
    hi: int,
    n_bins: int,
    probs: list[float],
) -> DataFrame:
    """Quantile estimates from a ``histogram_sketch``: one row per
    (key group, prob) — ``(keys..., prob, n, q_est_micro)`` with the
    estimate in micro-units of the value scale. Rank needed =
    ⌈p·n⌉ (exact integer ceiling); the owning bin is the first whose
    cumulative count reaches it; the within-bin position interpolates
    linearly. Probs must be in (0, 1]."""
    if not probs:
        raise ValueError("histogram_quantile: need at least one prob")
    for p in probs:
        if not (0.0 < p <= 1.0):
            raise ValueError(f"histogram_quantile: probs must be in (0, 1], got {p}")
    width = (hi - lo) // n_bins
    w_run = (
        Window.partitionBy(*keys)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    staged = sketch.select(
        *keys,
        "bin",
        "cnt",
        F.sum("cnt").over(w_run).cast("long").alias("__cum"),
        F.sum("cnt").over(w_all).cast("long").alias("__n"),
    ).withColumn("__cumb", F.col("__cum") - F.col("cnt"))
    frames = []
    for p in probs:
        p_micro = int(round(p * 1_000_000))
        need = F.expr(f"(__n * {p_micro} + 999999) div 1000000")
        reached = staged.where(F.col("__cum") >= need).withColumn("__need", need)
        own = reached.groupBy(*keys).agg(
            F.min(F.struct("bin", "__cumb", "cnt", "__n", "__need")).alias("__o")
        )
        est = (
            F.lit(lo).cast("long") * 1_000_000
            + F.col("__o.bin") * F.lit(width).cast("long") * 1_000_000
            + F.expr(
                f"((__o.__need - __o.__cumb) * 1000000 div __o.cnt) * {width}"
            )
        )
        frames.append(
            own.select(
                *keys,
                F.lit(float(p)).alias("prob"),
                F.col("__o.__n").alias("n"),
                est.cast("long").alias("q_est_micro"),
            )
        )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out
