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


def kendall_tau_b(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    max_group_rows: int = 5000,
) -> DataFrame:
    """Per-group Kendall tau-b between ``x_col`` and ``y_col`` (both
    cast to BIGINT; null-on-either rows excluded up front) — the
    concordance-based rank correlation, preferred over Spearman when
    the question is "how often does a larger x come with a larger y"
    and under heavy ties (tau-b's denominator corrects for both
    marginals). Returns ``(*group_cols, n, n_pairs, tau_b)`` rounded
    at 6; null when either axis is wholly tied.

    Kendall is inherently pairwise — Σ over i<j of
    sign(Δx)·sign(Δy) — so like ``theil_sen_slopes``
    (operators/robust.py) this operator embraces the O(n²) on a
    BOUNDED group and ENFORCES the bound at runtime: a group beyond
    ``max_group_rows`` raises (woven guard) rather than detonating a
    quadratic task. tau-b = (C − D) / √((n₀−n₁)(n₀−n₂)) with
    n₀ = n(n−1)/2 and n₁/n₂ the marginal tie-pair counts — all exact
    BIGINT (C − D is a sum of {−1,0,1}); the √ product stays below
    2^53 for n ≤ max_group_rows, so the one final double is exact
    before its rounding.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    work = df.select(*group_cols, x.alias("__x"), y.alias("__y")).filter(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )
    w_all = Window.partitionBy(*group_cols)
    guard_n = F.count(F.lit(1)).over(w_all)
    w_rn = Window.partitionBy(*group_cols).orderBy("__x", "__y")
    d = work.select(
        *group_cols,
        "__x",
        "__y",
        F.when(
            guard_n > int(max_group_rows),
            F.raise_error(
                F.lit(
                    f"kendall_tau_b: a group exceeds max_group_rows="
                    f"{max_group_rows}; pairwise concordance is O(n²) — "
                    "aggregate or sample upstream"
                )
            ).cast("long"),
        ).otherwise(F.row_number().over(w_rn).cast("long")).alias("__rn"),
    )
    a = d.select(*group_cols, F.col("__x").alias("__xa"), F.col("__y").alias("__ya"), F.col("__rn").alias("__ra"))
    b = d.select(
        *[F.col(k).alias(f"__k_{k}") for k in group_cols],
        F.col("__x").alias("__xb"),
        F.col("__y").alias("__yb"),
        F.col("__rn").alias("__rb"),
    )
    cond = [a[k] == b[f"__k_{k}"] for k in group_cols]
    cd = (
        a.join(b, cond)
        .where(F.col("__rb") > F.col("__ra"))
        .groupBy(*group_cols)
        .agg(
            F.sum(
                F.signum((F.col("__xb") - F.col("__xa")).cast("double")).cast("long")
                * F.signum((F.col("__yb") - F.col("__ya")).cast("double")).cast("long")
            )
            .cast("long")
            .alias("__cd")
        )
    )
    n_tbl = work.groupBy(*group_cols).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tx = (
        work.groupBy(*group_cols, "__x")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .groupBy(*group_cols)
        .agg(F.sum(F.expr("__c * (__c - 1) div 2")).cast("long").alias("__n1"))
    )
    ty = (
        work.groupBy(*group_cols, "__y")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .groupBy(*group_cols)
        .agg(F.sum(F.expr("__c * (__c - 1) div 2")).cast("long").alias("__n2"))
    )
    j = n_tbl.join(cd, group_cols, "left").join(tx, group_cols).join(ty, group_cols)
    n0 = F.expr("n * (n - 1) div 2")
    fx = (n0 - F.col("__n1")).cast("double")
    fy = (n0 - F.col("__n2")).cast("double")
    tau = F.when(
        (n0 - F.col("__n1") > 0) & (n0 - F.col("__n2") > 0),
        F.round(F.coalesce(F.col("__cd"), F.lit(0)).cast("double") / F.sqrt(fx * fy), 6),
    )
    return j.select(*group_cols, F.col("n"), n0.cast("long").alias("n_pairs"), tau.alias("tau_b"))


def ols_report(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    max_group_rows: int = 1_000_000,
) -> DataFrame:
    """Per-group simple least-squares fit of ``y_col`` on ``x_col``
    (both cast to BIGINT; rows with a null on either axis are
    excluded up front — the module's null discipline). Returns
    ``(*group_cols, n, slope, intercept, r2)`` with all three
    statistics rounded at 6; slope/intercept/r2 are null when the
    x axis is constant (zero variance ⇒ no fit), r2 additionally
    null when y is constant.

    The closed form runs entirely on exact integer moments
    (n, Σx, Σy, Σxy, Σx², Σy² as BIGINT sums — order-independent,
    engine-portable), with the covariance/variance cross terms
    (n·Σxy − Σx·Σy etc.) widened to DECIMAL(38,0) exactly as
    ``spearman_by_group`` does:

        slope     = Sxy / Sxx
        intercept = (Σy·Sxx − Sxy·Σx) / (n·Sxx)
        r2        = Sxy² / (Sxx·Syy)

    where Sxy = n·Σxy − ΣxΣy, Sxx = n·Σx² − (Σx)², Syy = n·Σy² − (Σy)².
    Only the final divisions (and r2's squaring, which can exceed
    DECIMAL(38,0)) are done in double — each a single IEEE operation
    on exactly-known integers, identical across engines, then rounded.

    Overflow contract: with |x| ≤ X and |y| ≤ Y per row, the decimal
    cross terms are ≤ n²·max(X², Y², XY) and the intercept numerator
    ≤ n²·X·Y·max(X, Y)·… — callers keep n ≤ ``max_group_rows``
    (runtime-enforced via a woven guard) and pre-scale values to
    ≤ ~10⁶ magnitude (e.g. whole currency units, not micro-cents)
    to stay far inside 38 digits.

    Plan shape: ONE shuffle (groupBy on the keys, map-side partial
    aggregation of all six moments), then pure projection. No window,
    no join — this is the cheapest per-group statistic in the module
    and safe at any group count.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    work = df.select(*group_cols, x.alias("__x"), y.alias("__y")).filter(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )
    agg = work.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    guard = F.when(
        F.col("n") > int(max_group_rows),
        F.raise_error(
            F.concat(
                F.lit("ols_report: group exceeds max_group_rows="),
                F.lit(str(int(max_group_rows))),
                F.lit(" (DECIMAL(38,0) moment bound); pre-aggregate or sample"),
            )
        ).cast("long"),
    ).otherwise(F.col("n"))
    agg = agg.withColumn("n", guard)
    dec = "decimal(38,0)"
    n = F.col("n").cast(dec)
    sx = F.col("__sx").cast(dec)
    sy = F.col("__sy").cast(dec)
    sxy_t = n * F.col("__sxy").cast(dec) - sx * sy
    sxx_t = n * F.col("__sxx").cast(dec) - sx * sx
    syy_t = n * F.col("__syy").cast(dec) - sy * sy
    slope = F.when(sxx_t > 0, F.round(sxy_t.cast("double") / sxx_t.cast("double"), 6))
    icept_num = sy * sxx_t - sxy_t * sx
    icept = F.when(
        sxx_t > 0, F.round(icept_num.cast("double") / (n * sxx_t).cast("double"), 6)
    )
    r2 = F.when(
        (sxx_t > 0) & (syy_t > 0),
        F.round(
            (sxy_t.cast("double") * sxy_t.cast("double"))
            / (sxx_t.cast("double") * syy_t.cast("double")),
            6,
        ),
    )
    return agg.select(
        *group_cols,
        F.col("n"),
        slope.alias("slope"),
        icept.alias("intercept"),
        r2.alias("r2"),
    )
