"""Rank correlation per group.

``spearman_by_group`` computes the Spearman rank-correlation
coefficient of two numeric columns within each group — the standard
monotone-association readout (robust to outliers and to any monotone
rescaling, unlike Pearson) behind "does account balance track spend"
style questions and feature-screening passes over training data.

Method: Spearman = Pearson over average ranks, with ties receiving
the mean of the rank positions they span. Average ranks are halves,
so the engine works on DOUBLED ranks, which are exact BIGINT via the
identity

    2*avg_rank = rank_asc - rank_desc + n + 1

(rank_asc/rank_desc are SQL RANK() over the group ascending /
descending by the value; for a tie block of size t starting at
position p, rank_asc = p, rank_desc = n - (p + t - 1) + 1, so the
identity yields p + (p+t-1), i.e. twice the mean position). Both
window passes share ONE group-keyed shuffle (same partition, two sort
orders), there is no join, and all moments (n, Σx, Σy, Σx², Σy², Σxy
over doubled ranks) are exact integer sums — order-independent and
engine-portable — with only the final division done in double and
rounded at 6, the same closed form as
``autocorrelation_report`` (operators/resample.py:376).

Overflow contract: doubled ranks are <= 2n, so Σx² <= 4n³ and the
closed-form products are <= 16n⁴ — computed in DECIMAL(38,0) they
are exact to n ~ 10^8 rows per group; the BIGINT moment sums bind
first at n > ~1.3e6 rows per group, which a runtime guard turns into
an explicit error (woven into the output so Catalyst keeps it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def spearman_by_group(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    max_group_rows: int = 1_000_000,
) -> DataFrame:
    """Per-group Spearman rho between ``x_col`` and ``y_col`` (both
    cast to BIGINT; rows with a null in either are excluded up
    front, documented null discipline). Returns
    ``(*group_cols, n, spearman_rho)`` with rho rounded at 6 and
    null when either axis is constant (zero rank variance).

    Groups larger than ``max_group_rows`` raise at runtime rather
    than risking BIGINT overflow in the rank-moment sums.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    work = df.select(*group_cols, x.alias("__x"), y.alias("__y")).filter(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )
    g = [F.col(c) for c in group_cols]
    wxa = Window.partitionBy(*g).orderBy(F.col("__x").asc())
    wxd = Window.partitionBy(*g).orderBy(F.col("__x").desc())
    wya = Window.partitionBy(*g).orderBy(F.col("__y").asc())
    wyd = Window.partitionBy(*g).orderBy(F.col("__y").desc())
    wn = Window.partitionBy(*g)
    n_w = F.count(F.lit(1)).over(wn)
    ranked = work.select(
        *group_cols,
        (F.rank().over(wxa) - F.rank().over(wxd) + n_w + 1).alias("__rx"),
        (F.rank().over(wya) - F.rank().over(wyd) + n_w + 1).alias("__ry"),
        n_w.alias("__n"),
    )
    guard = F.when(
        F.col("__n") > int(max_group_rows),
        F.raise_error(
            F.concat(
                F.lit("spearman_by_group: group exceeds max_group_rows="),
                F.lit(str(int(max_group_rows))),
                F.lit(" (BIGINT rank-moment bound); pre-aggregate or sample"),
            )
        ).cast("long"),
    ).otherwise(F.col("__rx"))
    ranked = ranked.withColumn("__rx", guard)
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__rx").alias("__sx"),
        F.sum("__ry").alias("__sy"),
        F.sum(F.col("__rx") * F.col("__rx")).alias("__sxx"),
        F.sum(F.col("__ry") * F.col("__ry")).alias("__syy"),
        F.sum(F.col("__rx") * F.col("__ry")).alias("__sxy"),
    )
    dec = "decimal(38,0)"
    n = F.col("n").cast(dec)
    dxx = n * F.col("__sxx").cast(dec) - F.col("__sx").cast(dec) * F.col("__sx").cast(dec)
    dyy = n * F.col("__syy").cast(dec) - F.col("__sy").cast(dec) * F.col("__sy").cast(dec)
    dxy = n * F.col("__sxy").cast(dec) - F.col("__sx").cast(dec) * F.col("__sy").cast(dec)
    rho = F.when(
        (dxx > 0) & (dyy > 0),
        F.round(
            dxy.cast("double") / F.sqrt(dxx.cast("double") * dyy.cast("double")), 6
        ),
    )
    return agg.select(*group_cols, F.col("n"), rho.alias("spearman_rho"))
