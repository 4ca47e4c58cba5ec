"""Streaming mergeable-sketch maintenance.

The point of a mergeable sketch (``operators/histo.py``: add counts =
merge) is that a STREAM can maintain it incrementally: each
micro-batch's partial histogram folds into state by the same
count-addition the batch merge test pins, so the final state of a
bounded run is bit-identical to the batch sketch over the same data —
which is exactly how the gate checks it (q199: availableNow →
memory sink → quantile extraction vs the batch SQL oracle).

State size is keys × n_bins rows — CONSTANT in the stream length,
the whole reason to sketch: a 100 TB replay and a 1 GB replay hold
the same state. Contrast with exact quantiles, whose streaming form
would have to retain every distinct value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_histogram(
    events: DataFrame,
    keys: list[str],
    value_col: str,
    lo: int,
    hi: int,
    n_bins: int,
) -> DataFrame:
    """Continuously-maintained equi-width histogram: a streaming
    groupBy on (keys, bin) whose running counts ARE the mergeable
    sketch (update/complete output modes both work — the aggregation
    state is the sketch). Bin rule identical to
    ``operators.histo.histogram_sketch`` (clamped edges, integral
    width enforced); null values excluded."""
    if n_bins < 1:
        raise ValueError(f"streaming_histogram: n_bins must be >= 1, got {n_bins}")
    if hi <= lo:
        raise ValueError(f"streaming_histogram: need hi > lo, got [{lo}, {hi})")
    if (hi - lo) % n_bins != 0:
        raise ValueError(
            f"streaming_histogram: bin width must be integral — "
            f"(hi - lo) = {hi - lo} is not divisible by n_bins = {n_bins}"
        )
    width = (hi - lo) // n_bins
    v = F.col(value_col).cast("long")
    bin_id = F.least(
        F.lit(n_bins - 1).cast("long"),
        F.greatest(
            F.lit(0).cast("long"), F.expr(f"({value_col} - {lo}) div {width}")
        ),
    )
    return (
        events.where(v.isNotNull())
        .groupBy(*keys, bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
