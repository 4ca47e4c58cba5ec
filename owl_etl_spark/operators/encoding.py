"""Leakage-safe categorical feature encoding.

Target encoding replaces a high-cardinality categorical column with
the mean of the label among rows sharing that category — the standard
trick for feeding categories a linear/GBM model can use without
one-hot blowup. Done naively it LEAKS: each row's own label is inside
its category mean, so the feature memorizes the label and validation
metrics lie. The leave-one-out (LOO) form fixes this exactly:

    loo_mean_i = (Σ_category − y_i) / (n_category − 1)

computed from the full-category sum WITH the row's own contribution
subtracted — no folds needed, deterministic, and each row sees only
the other rows' labels.

Determinism contract: the target must arrive as an exact integer
(cents, micro-units — the caller's choice, same rule as `_money_sum`);
the category sum is then an exact BIGINT window sum and the single
division per row is one IEEE double op, rounded at 6. Rows whose
category has n = 1 get NULL (no other rows to learn from — callers
impute with the global mean if they want a dense feature).

Scale shape: ONE shuffle (window partitioned by the category); the
sum and count ride the same partitioning; no join, no second pass.
At 100 TB this is strictly cheaper than the groupBy-plus-rejoin
formulation (one wide shuffle vs shuffle + broadcast/sort join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def loo_target_encode(
    df: DataFrame,
    category_cols: list[str],
    target_col: str,
    out_col: str = "loo_mean",
) -> DataFrame:
    """Append ``out_col`` = leave-one-out mean of ``target_col``
    within each ``category_cols`` cell, rounded at 6; NULL when the
    cell has a single row. Rows with a NULL target raise (woven
    guard) — a silently skipped label would shift every other row's
    encoding, so the contract is explicit: filter or impute first.
    """
    t0 = F.col(target_col).cast("long")
    t = F.when(
        t0.isNull(),
        F.raise_error(
            F.lit(
                f"loo_target_encode: {target_col} is NULL — filter or impute "
                "labels before encoding (every row shifts its cell's mean)"
            )
        ).cast("long"),
    ).otherwise(t0)
    w = Window.partitionBy(*[F.col(c) for c in category_cols])
    work = df.withColumn("__t", t)
    n = F.count(F.lit(1)).over(w)
    s = F.sum("__t").over(w)
    loo = F.when(
        n > 1,
        F.round(
            (s - F.col("__t")).cast("double") / (n - 1).cast("double"), 6
        ),
    )
    return work.withColumn(out_col, loo).drop("__t")
