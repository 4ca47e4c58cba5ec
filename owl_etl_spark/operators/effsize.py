"""Effect sizes for two-sample comparisons: Cohen's d and Cliff's
delta.

The readout layer the testing shelf stops short of: q231's
Mann-Whitney and q317's sequential z say whether groups differ;
these say by HOW MUCH on interpretable scales — d in pooled standard
deviations (parametric), Cliff's δ = P(x>y) − P(x<y) in pure
probability-of-superiority terms (ordinal, outlier-immune, the
companion every Mann-Whitney report should carry).

Exactness: Cohen's d comes from exact BIGINT moments (Σv, Σv² of
integer-unit values — the q59 discipline) through deterministic IEEE
sqrt/divide. Cliff's δ avoids the n·m pairwise comparison entirely:
collapse both groups to the DISTINCT-VALUE frame, then

    #(x>y) = Σ_v  n_x(v) · cum_y(< v)
    #(x<y) = Σ_v  n_x(v) · (m − cum_y(≤ v))

via cumulative sums over that tiny frame (the km_risk_table device) —
exact integers, ties excluded from both terms by construction, one
data-sized groupBy total. δ numerator/denominator stay BIGINT; only
the final ratios are doubles, rounded to 6.

At 100 TB: one (group, value) aggregate over the rows; everything
after runs on the distinct-value frame. Overflow: gt/lt ≤ n·m —
keep n·m < 9·10¹⁸ (a quintillion pairs; any real comparison is fine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def effect_size_report(
    df: DataFrame,
    group_col,
    value_col: str,
) -> DataFrame:
    """One row: (n_x, n_y, mean_x_micro, mean_y_micro, cohens_d_micro,
    n_gt, n_lt, cliffs_delta_micro). ``group_col`` must be 0/1 (1 = x,
    the "treatment" side); values integer-scaled by the caller.
    Pooled SD is the conventional SAMPLE form — Bessel-corrected
    per-group variances pooled with n_x+n_y−2 degrees of freedom, the
    d textbooks and libraries (pingouin, effsize) report — computed
    from exact moments via (n−1)·s² = n·var_pop, so the numerator is
    the same exact-BIGINT fold. A zero-variance pooled SD (or
    n_x+n_y ≤ 2, where the df denominator vanishes) yields NULL d
    rather than a fake infinity.
    """
    from pyspark.sql import Window

    d = df.select(
        F.col(group_col).cast("long").alias("__g"),
        F.col(value_col).cast("long").alias("__v"),
    )
    per = d.groupBy("__v").agg(
        F.sum(F.when(F.col("__g") == 1, 1).otherwise(0)).cast("long").alias("__nx"),
        F.sum(F.when(F.col("__g") == 1, 0).otherwise(1)).cast("long").alias("__ny"),
    )
    w_asc = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (
        per.withColumn("__cy_le", F.sum("__ny").over(w_asc).cast("long"))
        .withColumn("__cy_lt", (F.col("__cy_le") - F.col("__ny")).cast("long"))
    )
    moments = d.agg(
        F.sum(F.when(F.col("__g") == 1, 1).otherwise(0)).cast("long").alias("n_x"),
        F.sum(F.when(F.col("__g") == 1, 0).otherwise(1)).cast("long").alias("n_y"),
        F.sum(F.when(F.col("__g") == 1, F.col("__v"))).cast("long").alias("__sx"),
        F.sum(F.when(F.col("__g") == 1, F.col("__v") * F.col("__v"))).cast("long").alias("__sx2"),
        F.sum(F.when(F.col("__g") == 0, F.col("__v"))).cast("long").alias("__sy"),
        F.sum(F.when(F.col("__g") == 0, F.col("__v") * F.col("__v"))).cast("long").alias("__sy2"),
    )
    pairs = cum.crossJoin(F.broadcast(moments.select("n_y"))).agg(
        F.sum(F.col("__nx") * F.col("__cy_lt")).cast("long").alias("n_gt"),
        F.sum(F.col("__nx") * (F.col("n_y") - F.col("__cy_le"))).cast("long").alias("n_lt"),
    )
    out = moments.crossJoin(F.broadcast(pairs))
    mean_x = F.col("__sx").cast("double") / F.col("n_x").cast("double")
    mean_y = F.col("__sy").cast("double") / F.col("n_y").cast("double")
    var_x = F.col("__sx2").cast("double") / F.col("n_x").cast("double") - mean_x * mean_x
    var_y = F.col("__sy2").cast("double") / F.col("n_y").cast("double") - mean_y * mean_y
    # n·var_pop = (n−1)·s² exactly, so the sample pooled variance is
    # the same exact-moment numerator over n_x+n_y−2 degrees of freedom
    pooled = F.sqrt(
        (F.col("n_x").cast("double") * var_x + F.col("n_y").cast("double") * var_y)
        / (F.col("n_x") + F.col("n_y") - F.lit(2)).cast("double")
    )
    nm = F.col("n_x").cast("double") * F.col("n_y").cast("double")
    return out.select(
        "n_x",
        "n_y",
        F.round(mean_x * 1_000_000).cast("long").alias("mean_x_micro"),
        F.round(mean_y * 1_000_000).cast("long").alias("mean_y_micro"),
        F.when(
            (F.col("n_x") + F.col("n_y") > 2) & (pooled > 0),
            F.round((mean_x - mean_y) / pooled * 1_000_000),
        )
        .cast("long")
        .alias("cohens_d_micro"),
        "n_gt",
        "n_lt",
        F.round((F.col("n_gt") - F.col("n_lt")).cast("double") / nm * 1_000_000)
        .cast("long")
        .alias("cliffs_delta_micro"),
    )
