"""Spatial radius self-join via grid bucketing.

"All pairs of points within distance r" is the classic quadratic
trap: the naive cross-join compares every pair. The scale-safe plan
is GRID BUCKETING: hash each point to an r-sized square cell, explode
ONE side into its 3x3 cell neighborhood (constant ×9 fan-out), join
on the cell key, then apply the exact distance predicate. Any pair
within r differs by at most one cell per axis, so the neighborhood
join finds every qualifying pair; per-task candidates are bounded by
cell occupancy (points per r×r square), not by the corpus size —
the same bounded-expansion contract as the LSH band joins and
fifo_allocate's unit-range bucketing elsewhere in this repo.

Pair dedup is by construction, not a distinct pass: the probe side
sits in exactly one cell, so each ordered direction of a pair joins
exactly once, and the ``id_a < id_b`` filter keeps exactly one
unordered pair.

Determinism: coordinates and the radius are integers; the distance
test compares exact BIGINT squared distances (needs coordinate
magnitude < ~2^31 so dx² + dy² < 2^63 — planar micro-degree or
projected-meter grids fit easily).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All unordered pairs of ``points`` within Euclidean distance
    ``radius`` (inclusive), as ``(id_a, id_b, dist2)`` with
    ``id_a < id_b`` and the exact squared distance.

    Rows with a null id/coordinate are excluded (a point without a
    position cannot be near anything). Coordinates must be integral
    (cast upstream); radius must be a positive integer.
    """
    if radius < 1:
        raise ValueError(f"grid_radius_join: radius must be >= 1, got {radius}")
    r = int(radius)
    p = points.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    ).where(
        F.col("__id").isNotNull() & F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )
    cell = p.withColumn("__cx", F.expr(f"__x div {r}")).withColumn(
        "__cy", F.expr(f"__y div {r}")
    )
    # Build side: exploded into its own + 8 neighbor cells (×9, a
    # constant). Probe side: its own cell only.
    d = F.explode(F.sequence(F.lit(-1), F.lit(1)))
    build = (
        cell.withColumn("__dx", d)
        .withColumn("__dy", d)
        .select(
            F.col("__id").alias("__id_a"),
            F.col("__x").alias("__xa"),
            F.col("__y").alias("__ya"),
            (F.col("__cx") + F.col("__dx")).alias("__cx"),
            (F.col("__cy") + F.col("__dy")).alias("__cy"),
        )
    )
    probe = cell.select(
        F.col("__id").alias("__id_b"),
        F.col("__x").alias("__xb"),
        F.col("__y").alias("__yb"),
        "__cx",
        "__cy",
    )
    dx = F.col("__xa") - F.col("__xb")
    dy = F.col("__ya") - F.col("__yb")
    return (
        build.join(probe, ["__cx", "__cy"])
        .where(F.col("__id_a") < F.col("__id_b"))
        .withColumn("dist2", (dx * dx + dy * dy).cast("long"))
        .where(F.col("dist2") <= F.lit(r * r).cast("long"))
        .select(
            F.col("__id_a").alias("id_a"), F.col("__id_b").alias("id_b"), "dist2"
        )
    )
