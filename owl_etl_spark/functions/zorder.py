"""Z-order (Morton) interleaved-bit clustering keys.

``write_sorted_parquet`` clusters on ONE key; queries filtering on a
*different* key still scan everything. Z-ordering interleaves the bits
of two (rank-normalized) keys so that sorting by the combined key
keeps BOTH dimensions locally compact — a 2-D box predicate touches
O(perimeter) files instead of O(n). This is the same idea Delta/
Iceberg expose as ``OPTIMIZE ZORDER BY``; here it is a plain column
expression + the existing range-partitioned sorted writer, nothing
engine-specific.

Scale notes: rank normalization needs each column's min/max — one
cheap stats pass (or provide known bounds); the interleave itself is
a pure per-row expression (loop-unrolled shifts, whole-stage codegen,
no UDF, no shuffle beyond the final range partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton key from two integer columns already in [0, 2**bits):
    bit i of ``a`` lands at position 2i+1, of ``b`` at 2i."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(1), 2 * i + 1))
        terms.append(F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(1), 2 * i))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min-max scale a numeric column to integer ranks in [0, 2**bits)."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1))
    frac = (col.cast("double") - lo) / span
    mx = (1 << bits) - 1
    return F.least(F.lit(mx), F.greatest(F.lit(0), F.floor(frac * mx).cast("long")))


def zorder_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16, key_col: str = "__zkey"
) -> DataFrame:
    """Attach a Morton key over two numeric columns. Bounds come from
    one min/max aggregation (broadcast as literals into the row
    expression — the plan stays shuffle-free)."""
    stats = df.agg(
        F.min(col_a).alias("alo"), F.max(col_a).alias("ahi"),
        F.min(col_b).alias("blo"), F.max(col_b).alias("bhi"),
    ).collect()[0]
    a = _scale_to_bits(F.col(col_a), F.lit(stats.alo), F.lit(stats.ahi), bits)
    b = _scale_to_bits(F.col(col_b), F.lit(stats.blo), F.lit(stats.bhi), bits)
    return df.withColumn(key_col, interleave_bits(a, b, bits))


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    target_partitions: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Z-order of (col_a, col_b): range
    partition + sort on the Morton key, then drop it. Point/box
    queries on EITHER or BOTH columns prune files via parquet min/max
    stats."""
    keyed = zorder_key(df, col_a, col_b, bits)
    (
        keyed.repartitionByRange(target_partitions, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )
