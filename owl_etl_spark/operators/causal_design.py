"""Observational causal designs: nearest-neighbor matching and
regression discontinuity.

Round-10 wave 10, completing the engine's causal toolkit (stratified
ATE, AIPW doubly-robust, CUPED, quantile treatment effects,
difference-in-differences) with the two classic DESIGNS those
estimators don't cover:

- :func:`nn_match_att` — 1:1 nearest-neighbor matching WITH
  replacement on a scalar score within a caliper (the matching
  estimator of the ATT); with-replacement matching is the
  deterministic, embarrassingly-parallel variant (greedy
  without-replacement is order-dependent and inherently sequential —
  stated);
- :func:`regression_discontinuity` — sharp RD: local linear fits on
  each side of a cutoff within a bandwidth, jump = difference of the
  side intercepts at the cutoff.

Exactness: scores/outcomes are exact integers; matching distances
and tie rules are pure integer comparisons; the RD side fits come
from exact BIGINT moments with the slope/intercept as single snapped
double expressions (the chi²/ANOVA device).

Scale posture: matching is ONE sort-based window pass over the
treated ∪ control union (two directions) — the as-of-join shape, no
pairwise work; RD is one bounded aggregate per side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_M = 1_000_000


def _fd(x: str, d: str):
    """Exact floor division of BIGINT SQL fragments (the q291 device)."""
    return F.expr(f"(({x}) - (((({x}) % ({d})) + ({d})) % ({d}))) div ({d})")


def nn_match_att(
    df: DataFrame,
    treat_col: str,
    score_col: str,
    outcome_col: str,
    id_col: str,
    caliper: int,
) -> DataFrame:
    """ATT by 1:1 nearest-neighbor matching with replacement: every
    treated unit matches the control whose integer ``score_col`` is
    nearest (backward preferred on exact distance ties; among
    equal-score controls the smallest ``id_col`` wins — fully
    deterministic), subject to |Δscore| ≤ ``caliper``; treated units
    with no control in the caliper are dropped from the estimate and
    counted.

    Returns one row ``(n_treated, n_control, n_matched, n_unmatched,
    mean_t_micro, mean_c_micro, att_micro)`` — exact floor-division
    means over the matched set; ATT = mean(y_t − y_match) (NULL when
    nothing matches).

    Plan: the union frame is sorted ONCE per direction
    ((score, side, id) windows carrying the running last control as
    a struct) — the as-of-join shape: no pairwise candidate
    generation, volumes stay linear in rows. The single-partition
    window is the stated cost of exact global nearest-neighbor
    matching; pre-partition by stratum (exact-match keys) to
    parallelize when the score is per-stratum.
    """
    d = df.select(
        F.col(treat_col).cast("boolean").alias("__t"),
        F.col(score_col).cast("long").alias("__s"),
        F.col(outcome_col).cast("long").alias("__y"),
        F.col(id_col).cast("long").alias("__id"),
    ).filter(
        F.col("__t").isNotNull()
        & F.col("__s").isNotNull()
        & F.col("__y").isNotNull()
        & F.col("__id").isNotNull()
    )
    ctrl_struct = F.when(
        ~F.col("__t"), F.struct(F.col("__s").alias("cs"), F.col("__y").alias("cy"))
    )
    w_b = (
        Window.orderBy(
            F.col("__s").asc(), F.col("__t").asc(), F.col("__id").desc()
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.orderBy(
            F.col("__s").desc(), F.col("__t").asc(), F.col("__id").desc()
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = d.withColumn("__b", F.last(ctrl_struct, ignorenulls=True).over(w_b))
    staged = staged.withColumn("__f", F.last(ctrl_struct, ignorenulls=True).over(w_f))
    db = F.col("__s") - F.col("__b.cs")
    df_ = F.col("__f.cs") - F.col("__s")
    pick_b = F.col("__b").isNotNull() & (
        F.col("__f").isNull() | (db <= df_)
    )
    pick_f = F.col("__f").isNotNull() & (F.col("__b").isNull() | (df_ < db))
    matched_y = F.when(pick_b, F.col("__b.cy")).when(pick_f, F.col("__f.cy"))
    matched_d = F.when(pick_b, db).when(pick_f, df_)
    staged = staged.withColumn(
        "__my", F.when(F.col("__t") & (matched_d <= int(caliper)), matched_y)
    )
    g = staged.groupBy().agg(
        F.sum(F.col("__t").cast("long")).cast("long").alias("n_treated"),
        F.sum((~F.col("__t")).cast("long")).cast("long").alias("n_control"),
        F.sum(F.col("__my").isNotNull().cast("long")).cast("long").alias("n_matched"),
        F.sum(F.when(F.col("__my").isNotNull(), F.col("__y")).otherwise(0))
        .cast("long")
        .alias("__sy_t"),
        F.sum(F.coalesce(F.col("__my"), F.lit(0))).cast("long").alias("__sy_c"),
    )
    ok = F.col("n_matched") > 0
    return g.select(
        "n_treated",
        "n_control",
        "n_matched",
        (F.col("n_treated") - F.col("n_matched")).cast("long").alias("n_unmatched"),
        F.when(ok, _fd("__sy_t * 1000000", "n_matched").cast("long")).alias(
            "mean_t_micro"
        ),
        F.when(ok, _fd("__sy_c * 1000000", "n_matched").cast("long")).alias(
            "mean_c_micro"
        ),
        F.when(
            ok,
            _fd("(__sy_t - __sy_c) * 1000000", "n_matched").cast("long"),
        ).alias("att_micro"),
    )


def regression_discontinuity(
    df: DataFrame,
    running_col: str,
    outcome_col: str,
    cutoff: int = 0,
    bandwidth: int = 0,
) -> DataFrame:
    """Sharp regression discontinuity: local linear fit of the integer
    outcome on the centered integer running variable, separately on
    each side of ``cutoff`` within ``bandwidth`` (0 = use all data —
    stated; pick a bandwidth for the usual local estimate). The
    treatment-at-cutoff effect is the jump between the two side
    intercepts at x = 0.

    Side convention: "above" includes the cutoff (x ≥ 0 after
    centering), the standard sharp-RD assignment.

    Returns one row ``(n_below, n_above, slope_below_micro,
    slope_above_micro, intercept_below_micro, intercept_above_micro,
    jump_micro)`` — each side's slope b = (nΣxy − ΣxΣy)/(nΣx² −
    (Σx)²) and intercept a = (Σy − b·Σx)/n as single snapped double
    expressions of exact BIGINT moments; NULL when a side is
    degenerate (n < 2 or zero x-variance).

    Plan: one conditional-moment aggregate (map-side combined), then
    scalar arithmetic on the single row. No joins, no windows.
    """
    x = (F.col(running_col).cast("long") - int(cutoff)).alias("__x")
    d = df.select(
        x,
        F.col(outcome_col).cast("long").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    if int(bandwidth) > 0:
        d = d.filter(F.abs(F.col("__x")) <= int(bandwidth))
    lo = F.col("__x") < 0
    g = d.groupBy().agg(
        F.sum(lo.cast("long")).cast("long").alias("n_below"),
        F.sum((~lo).cast("long")).cast("long").alias("n_above"),
        F.sum(F.when(lo, F.col("__x")).otherwise(0)).cast("long").alias("__sxb"),
        F.sum(F.when(lo, F.col("__y")).otherwise(0)).cast("long").alias("__syb"),
        F.sum(F.when(lo, F.col("__x") * F.col("__y")).otherwise(0))
        .cast("long")
        .alias("__sxyb"),
        F.sum(F.when(lo, F.col("__x") * F.col("__x")).otherwise(0))
        .cast("long")
        .alias("__sx2b"),
        F.sum(F.when(~lo, F.col("__x")).otherwise(0)).cast("long").alias("__sxa"),
        F.sum(F.when(~lo, F.col("__y")).otherwise(0)).cast("long").alias("__sya"),
        F.sum(F.when(~lo, F.col("__x") * F.col("__y")).otherwise(0))
        .cast("long")
        .alias("__sxya"),
        F.sum(F.when(~lo, F.col("__x") * F.col("__x")).otherwise(0))
        .cast("long")
        .alias("__sx2a"),
    )

    def _fit(n, sx, sy, sxy, sx2):
        nd = F.col(n).cast("double")
        sxd = F.col(sx).cast("double")
        syd = F.col(sy).cast("double")
        sxyd = F.col(sxy).cast("double")
        sx2d = F.col(sx2).cast("double")
        det = nd * sx2d - sxd * sxd
        slope = (nd * sxyd - sxd * syd) / det
        intercept = (syd - slope * sxd) / nd
        ok = (F.col(n) >= 2) & (det > 0)
        return (
            F.when(ok, F.round(F.lit(float(_M)) * slope).cast("long")),
            F.when(ok, F.round(F.lit(float(_M)) * intercept).cast("long")),
            ok,
        )

    sb, ib, okb = _fit("n_below", "__sxb", "__syb", "__sxyb", "__sx2b")
    sa, ia, oka = _fit("n_above", "__sxa", "__sya", "__sxya", "__sx2a")
    return g.select(
        "n_below",
        "n_above",
        sb.alias("slope_below_micro"),
        sa.alias("slope_above_micro"),
        ib.alias("intercept_below_micro"),
        ia.alias("intercept_above_micro"),
        F.when(okb & oka, (ia - ib).cast("long")).alias("jump_micro"),
    )


def balance_table(
    df: DataFrame,
    treat_col: str,
    covariates: list[str],
) -> DataFrame:
    """Covariate balance report — the diagnostic every matching/
    weighting analysis (q351's design) must print: per covariate, the
    standardized mean difference

        SMD = (mean_t − mean_c) / √((s_t² + s_c²)/2)

    with Bessel-corrected group variances (|SMD| < 0.1 is the usual
    "balanced" rule of thumb). Rows with a null treatment flag are
    excluded; a covariate's null rows are excluded for THAT covariate
    only (stated per-covariate complete-case discipline).

    Returns one row per covariate: ``(covariate, n_t, n_c,
    mean_t_micro, mean_c_micro, smd_micro)`` — means exact floor
    divisions, SMD one snapped double expression of the exact BIGINT
    moments (NULL when a side has n < 2 or the pooled spread is 0).

    Plan: ONE global aggregate computing conditional moments for
    every covariate simultaneously (map-side combined), then a
    covariate-cardinality stack. No joins, no windows, single pass.
    """
    if not covariates:
        raise ValueError("balance_table: need at least one covariate")
    t = F.col(treat_col).cast("boolean")
    d = df.filter(t.isNotNull())
    aggs = []
    for c in covariates:
        v = F.col(c).cast("long")
        on_t = t & v.isNotNull()
        on_c = (~t) & v.isNotNull()
        aggs += [
            F.sum(on_t.cast("long")).cast("long").alias(f"__nt_{c}"),
            F.sum(on_c.cast("long")).cast("long").alias(f"__nc_{c}"),
            F.sum(F.when(on_t, v).otherwise(0)).cast("long").alias(f"__st_{c}"),
            F.sum(F.when(on_c, v).otherwise(0)).cast("long").alias(f"__sc_{c}"),
            F.sum(F.when(on_t, v * v).otherwise(0)).cast("long").alias(f"__qt_{c}"),
            F.sum(F.when(on_c, v * v).otherwise(0)).cast("long").alias(f"__qc_{c}"),
        ]
    g = d.groupBy().agg(*aggs)
    rows = []
    for c in covariates:
        nt, nc = F.col(f"__nt_{c}"), F.col(f"__nc_{c}")
        st, sc = F.col(f"__st_{c}"), F.col(f"__sc_{c}")
        qt, qc = F.col(f"__qt_{c}"), F.col(f"__qc_{c}")
        ntd, ncd = nt.cast("double"), nc.cast("double")
        var_t = (qt.cast("double") - st.cast("double") * st / ntd) / (ntd - 1.0)
        var_c = (qc.cast("double") - sc.cast("double") * sc / ncd) / (ncd - 1.0)
        spread = F.sqrt((var_t + var_c) / 2.0)
        ok = (nt >= 2) & (nc >= 2) & (spread > 0)
        smd = F.round(
            F.lit(1_000_000.0)
            * (st.cast("double") / ntd - sc.cast("double") / ncd)
            / spread
        ).cast("long")
        rows.append(
            F.struct(
                F.lit(c).alias("covariate"),
                nt.alias("n_t"),
                nc.alias("n_c"),
                F.when(
                    nt > 0, _fd(f"__st_{c} * 1000000", f"__nt_{c}").cast("long")
                ).alias("mean_t_micro"),
                F.when(
                    nc > 0, _fd(f"__sc_{c} * 1000000", f"__nc_{c}").cast("long")
                ).alias("mean_c_micro"),
                F.when(ok, smd).alias("smd_micro"),
            )
        )
    return g.select(
        F.explode(F.array(*rows)).alias("__r")
    ).select("__r.*")
