"""Pareto frontier (2-D skyline) per group, window-only.

"Which points are not dominated" (no other point is ≥ in both
dimensions and > in at least one) is classically solved with a
quadratic self-join — the trap this module avoids. In 2-D the
frontier has a sweep-line identity: sort by x descending and a point
is dominated iff

  (a) some point with STRICTLY greater x has y ≥ mine, or
  (b) some point with EQUAL x has y strictly greater.

Both conditions are window maxima over the same (group, order-by-x)
partitioning: (a) is ``max(y) RANGE BETWEEN UNBOUNDED PRECEDING AND
1 PRECEDING`` on x descending (the value-range frame expresses
"strictly greater x" exactly, ties excluded by construction), and
(b) is ``max(y)`` partitioned by (group, x). ONE shuffle on the
group keys, zero joins, no quadratic anywhere — per-task cost is the
sort, frontier size never matters.

Determinism: x and y must be integers (cast upstream); the dominance
comparisons are exact BIGINT. Equal (x, y) duplicates do not
dominate each other and all surface, matching the set definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier(
    df: DataFrame,
    keys: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Rows of ``df`` not Pareto-dominated within their key group
    (both dimensions maximized), as ``(keys..., x, y)`` plus the
    caller's other columns dropped — select what you need upstream.

    Rows with a null x or y are excluded (an unknown coordinate can
    neither dominate nor sit on a frontier).
    """
    d = df.select(
        *keys,
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    w_gt = (
        Window.partitionBy(*keys)
        .orderBy(F.col("x").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy(*keys, "x")
    staged = d.select(
        *keys,
        "x",
        "y",
        F.max("y").over(w_gt).alias("__best_y_gt_x"),
        F.max("y").over(w_eq).alias("__best_y_eq_x"),
    )
    dominated = (
        F.col("__best_y_gt_x").isNotNull()
        & (F.col("__best_y_gt_x") >= F.col("y"))
    ) | (F.col("__best_y_eq_x") > F.col("y"))
    return staged.where(~dominated).select(*keys, "x", "y")
