"""Robust (Theil-Sen) trend estimation: the median of pairwise
slopes.

OLS slopes (``profile.trend_report``) break under a single wild
outlier; Theil-Sen's breakdown point is ~29%. The estimator is
inherently pairwise — median over all (i < j) of
(v_j − v_i)/(t_j − t_i) — so this operator embraces the O(n²) on a
BOUNDED series and ENFORCES the bound at runtime: a key whose series
exceeds ``max_points`` raises rather than silently detonating a
quadratic task (the q142/q29 hot-key discipline, applied to an
algorithm that is quadratic by definition — callers aggregate to a
coarser grid, they don't get to discover the blowup in production).

Per-task fan-out is therefore ≤ max_points² — a compile-time
constant. Determinism: slope = one IEEE division of exact BIGINTs
(bit-identical on any engine); the median picks rank-⌈n/2⌉ /
⌈(n+1)/2⌉ elements under a total order (slope, i, j) and averages
two exact doubles — value ties cannot move the median value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def theil_sen_slopes(
    df: DataFrame,
    keys: list[str],
    t_col: str,
    value_col: str,
    max_points: int = 1000,
) -> DataFrame:
    """Per key group: ``(keys..., n_points, n_pairs, ts_slope)`` —
    the Theil-Sen slope of value over t, rounded at 6. Requires
    distinct ``t_col`` per row within a key (duplicate timestamps have
    no defined pairwise slope — aggregate upstream; they raise).
    Groups with a single point emit a null slope."""
    if max_points < 2:
        raise ValueError(f"theil_sen_slopes: max_points must be >= 2, got {max_points}")
    w_all = Window.partitionBy(*keys)
    guard_n = F.count(F.lit(1)).over(w_all)
    d = df.select(
        *keys,
        F.col(t_col).cast("long").alias("__t"),
        F.col(value_col).cast("long").alias("__v"),
    ).where(F.col(t_col).isNotNull() & F.col(value_col).isNotNull())
    guard_t = F.count(F.lit(1)).over(Window.partitionBy(*keys, "__t"))
    d = d.withColumn(
        "__n",
        F.when(
            guard_n > max_points,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"theil_sen_slopes: a key group exceeds max_points="
                        f"{max_points} ("
                    ),
                    guard_n.cast("string"),
                    F.lit(" rows); aggregate to a coarser grid first"),
                )
            ).cast("long"),
        )
        .when(
            guard_t > 1,
            F.raise_error(
                F.lit(
                    f"theil_sen_slopes: duplicate {t_col} within a key group — "
                    "pairwise slopes are undefined at zero time delta; "
                    "aggregate upstream"
                )
            ).cast("long"),
        )
        .otherwise(guard_n),
    )
    a = d.select(*keys, F.col("__t").alias("__ta"), F.col("__v").alias("__va"), "__n")
    b = d.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.col("__t").alias("__tb"),
        F.col("__v").alias("__vb"),
    )
    cond = [a[k] == b[f"__k_{k}"] for k in keys]
    pairs = (
        a.join(b, cond)
        .where(F.col("__tb") > F.col("__ta"))
        .select(
            *keys,
            "__n",
            "__ta",
            "__tb",
            (
                (F.col("__vb") - F.col("__va"))
                / (F.col("__tb") - F.col("__ta")).cast("double")
            ).alias("__slope"),
        )
    )
    w_rank = Window.partitionBy(*keys).orderBy("__slope", "__ta", "__tb")
    w_cnt = Window.partitionBy(*keys)
    ranked = pairs.select(
        *keys,
        "__n",
        "__slope",
        F.row_number().over(w_rank).cast("long").alias("__r"),
        F.count(F.lit(1)).over(w_cnt).cast("long").alias("__np"),
    )
    lo = F.expr("(__np + 1) div 2")
    hi = F.expr("(__np + 2) div 2")
    med = ranked.where((F.col("__r") == lo) | (F.col("__r") == hi)).groupBy(*keys).agg(
        F.max("__n").alias("n_points"),
        F.max("__np").alias("n_pairs"),
        F.round(F.avg("__slope"), 6).alias("ts_slope"),
    )
    singletons = (
        d.groupBy(*keys)
        .agg(F.max("__n").alias("n_points"))
        .where(F.col("n_points") == 1)
        .select(
            *keys,
            "n_points",
            F.lit(0).cast("long").alias("n_pairs"),
            F.lit(None).cast("double").alias("ts_slope"),
        )
    )
    return med.unionByName(singletons)
