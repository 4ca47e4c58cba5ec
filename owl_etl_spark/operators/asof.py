"""As-of join and bucketed range join — operators Spark lacks natively.

As-of join (backward): for each left row, the single right row with
the greatest ``right_ts <= left_ts`` within the same key — the
canonical time-series enrichment (trades→quotes, events→latest state).

Spark has no ASOF JOIN; the naive theta-join + window is O(n·m) per
key. This implementation uses the **union trick**: tag both sides,
sort per key by (ts, side), and carry the last-seen right row forward
with ``last(..., ignorenulls)`` over an unbounded-preceding frame —
one shuffle + one sort, O((n+m) log(n+m)) per key, no join blow-up.
That is also exactly the shape that scales: the same partition-and-
sort a sort-merge join would pay, with no candidate multiplication.

Range join: equi-bucket the range key so candidates are bounded, then
filter exactly — turning an O(n·m) theta join into a few equi-join
probes per row (guide: bucketize + equi-join on bucket + filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: attach the latest right row at-or-before
    each left row's timestamp, per key.

    Ties (right_ts == left_ts) match, per ASOF convention. Output: all
    left columns + each requested right column as ``<col><suffix>``
    (null when no right row precedes).
    """
    right_cols = right_cols or [c for c in right.columns if c not in on and c != right_ts]
    l_tagged = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in right_cols]).alias("s")).schema["s"].dataType.simpleString()
        ).alias("__r"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # right sorts BEFORE left at equal ts → ties match
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s")).schema["s"].dataType.simpleString()
        ).alias("__l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        F.col("__l.*"),
        *[F.col(f"__last_r.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_lo: str,
    left_hi: str,
    right_point: str,
    bucket_width: int,
) -> DataFrame:
    """Interval join: pair each left [lo, hi] with right points inside
    it (same keys), via range bucketing.

    Left rows are exploded into the buckets their interval spans; the
    join is an equi-join on (keys, bucket) followed by the exact
    containment filter — candidate count per row is bounded by interval
    length / bucket_width + 1 instead of the whole key group.
    ``bucket_width`` in the units of the (numeric) range columns.
    """
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(left_lo) / bucket_width).cast("long"),
                (F.col(left_hi) / bucket_width).cast("long"),
            )
        ),
    )
    rb = right.withColumn("__bucket", (F.col(right_point) / bucket_width).cast("long"))
    return (
        lb.join(rb, on + ["__bucket"])
        .filter((F.col(right_point) >= F.col(left_lo)) & (F.col(right_point) <= F.col(left_hi)))
        .drop("__bucket")
    )
