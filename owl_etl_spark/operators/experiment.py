"""Experimentation estimators: difference-in-differences and CUPED.

The causal/experimentation shelf next to the testing shelf
(profile.ab_test_report's Welch t, sprt.sprt_monitor's sequential
boundary, stats_tests' nonparametrics):

- ``did_report`` — the 2×2 difference-in-differences estimator, the
  workhorse for launches that can't be randomized: the treatment
  group's pre→post change minus the control group's pre→post change
  cancels both group-level and time-level confounds (under parallel
  trends, which is the analyst's job to defend).
- ``cuped_report`` — CUPED variance reduction (Deng et al. 2013):
  adjust the experiment metric with a pre-experiment covariate,
  Y' = Y − θ(X − X̄), θ = cov(X,Y)/var(X); same expectation,
  strictly smaller variance — the standard trick that shrinks A/B
  confidence intervals ~30-50% for free.

Exactness: both are pure moment arithmetic — every sum (Σy per cell;
n, Σx, Σy, Σxy, Σx², Σy²) is an exact BIGINT with cross terms
widened to DECIMAL(38,0) (the spearman/ols device), and only the
final ratios run in double, rounded at 6. One map-side-combined
aggregate each; no windows, no joins of row volumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def did_report(
    df: DataFrame,
    group_col: str,
    period_col: str,
    value_col: str,
) -> DataFrame:
    """The 2×2 DiD table and estimate: ``group_col`` (1 = treated,
    0 = control) × ``period_col`` (1 = post, 0 = pre) over an exact
    integer ``value_col``. Returns ONE row: per-cell n and mean
    (rounded at 6) plus ``did`` = (ȳ_t1 − ȳ_t0) − (ȳ_c1 − ȳ_c0).
    Rows with null/out-of-domain group/period/value raise (woven) —
    a silently dropped cell row biases the estimate. Any empty cell
    yields a null ``did`` (the design is broken, not zero)."""
    g0, p0, v0 = (
        F.col(group_col).cast("long"),
        F.col(period_col).cast("long"),
        F.col(value_col).cast("long"),
    )
    bad = (
        g0.isNull() | ~g0.isin(0, 1) | p0.isNull() | ~p0.isin(0, 1) | v0.isNull()
    )
    g = F.when(
        bad,
        F.raise_error(
            F.lit(
                "did_report: group/period must be 0/1 and value non-null — "
                "clean the design matrix first"
            )
        ).cast("long"),
    ).otherwise(g0)
    work = df.select(g.alias("__g"), p0.alias("__p"), v0.alias("__v"))

    def cell(gv: int, pv: int, what: str):
        cond = (F.col("__g") == gv) & (F.col("__p") == pv)
        n = F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n_{what}")
        s = F.sum(F.when(cond, F.col("__v")).otherwise(0)).cast("long").alias(
            f"__s_{what}"
        )
        return n, s

    aggs = []
    for gv, pv, what in ((0, 0, "c0"), (0, 1, "c1"), (1, 0, "t0"), (1, 1, "t1")):
        aggs.extend(cell(gv, pv, what))
    a = work.agg(*aggs)
    means = {}
    for what in ("c0", "c1", "t0", "t1"):
        means[what] = F.when(
            F.col(f"n_{what}") > 0,
            F.col(f"__s_{what}").cast("double") / F.col(f"n_{what}").cast("double"),
        )
    did = F.round(
        (means["t1"] - means["t0"]) - (means["c1"] - means["c0"]), 6
    )
    return a.select(
        *[F.col(f"n_{w}") for w in ("c0", "c1", "t0", "t1")],
        *[F.round(means[w], 6).alias(f"mean_{w}") for w in ("c0", "c1", "t0", "t1")],
        did.alias("did"),
    )


def cuped_report(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """CUPED readout over unit-level rows (one row per user/unit with
    pre-metric ``x_col`` and experiment metric ``y_col``, both exact
    integers; null-on-either rows are excluded — units without
    pre-period data can't be adjusted, the documented discipline).
    Returns ONE row: ``(n, theta, var_y, var_adj,
    var_reduction_pct)`` — θ = cov(X,Y)/var(X) (population moments),
    var_adj = var(Y)·(1 − ρ²), reduction = 100·ρ², all rounded at 6;
    θ and friends null when var(X) = 0 (constant covariate adjusts
    nothing)."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    work = df.select(x.alias("__x"), y.alias("__y")).filter(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )
    a = work.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    dec = "decimal(38,0)"
    n = F.col("n").cast(dec)
    sx, sy = F.col("__sx").cast(dec), F.col("__sy").cast(dec)
    cxy = n * F.col("__sxy").cast(dec) - sx * sy
    cxx = n * F.col("__sxx").cast(dec) - sx * sx
    cyy = n * F.col("__syy").cast(dec) - sy * sy
    nd = F.col("n").cast("double")
    var_y = cyy.cast("double") / (nd * nd)
    theta = F.when(cxx > 0, F.round(cxy.cast("double") / cxx.cast("double"), 6))
    rho2 = (cxy.cast("double") * cxy.cast("double")) / (
        cxx.cast("double") * cyy.cast("double")
    )
    var_adj = F.when(
        (cxx > 0) & (cyy > 0), F.round(var_y * (F.lit(1.0) - rho2), 6)
    )
    red = F.when((cxx > 0) & (cyy > 0), F.round(rho2 * 100.0, 6))
    return a.select(
        F.col("n"),
        theta.alias("theta"),
        F.round(var_y, 6).alias("var_y"),
        var_adj.alias("var_adj"),
        red.alias("var_reduction_pct"),
    )
