"""Incremental aggregate maintenance: keep gold rollups fresh by
merging each new partition's *partial* aggregates instead of
rescanning history.

The reference reloads whole documents on arrival (delete-and-replace,
src/etl/load.py:111-132); at 100 TB a monthly drop must not recompute
the all-time rollup. Algebraic aggregates (count/sum/min/max, and
avg = sum/count derived at read time) merge exactly: partials per
(keys) from the new partition union with the stored state and
re-aggregate — cost is O(|new| + |state|), independent of history
size. Pair with ``operators.sketches`` for mergeable distinct counts
and ``writers.write_partition_overwrite`` for the storage side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: merge rule per metric suffix: how two partial values combine.
_MERGE = {
    "cnt": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def partial_agg(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Partial state for one batch/partition: count, sum (integer-cents
    for cross-run exactness), min, max of ``value_col`` per key."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(cents).cast("long").alias("sum"),
        F.min(cents).cast("long").alias("min"),
        F.max(cents).cast("long").alias("max"),
    )


def merge_partial_aggs(state: DataFrame, new_partials: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a new batch's partials into the stored state. Exact for
    algebraic metrics — merged state is bit-identical to a full
    recompute (integer domain), in any merge order."""
    return (
        state.unionByName(new_partials)
        .groupBy(*keys)
        .agg(*[rule(c).cast("long").alias(c) for c, rule in _MERGE.items()])
    )


def finalize(df: DataFrame, scale: int = 100) -> DataFrame:
    """Reader-facing view of the state: back to domain units with the
    derived mean (never stored — avg is not algebraic; sum/count is)."""
    return df.select(
        *[c for c in df.columns if c not in _MERGE],
        F.col("cnt").alias("n"),
        (F.col("sum").cast("double") / scale).alias("total"),
        (F.col("min").cast("double") / scale).alias("minimum"),
        (F.col("max").cast("double") / scale).alias("maximum"),
        F.round(F.col("sum").cast("double") / F.col("cnt") / scale, 6).alias("mean"),
    )
