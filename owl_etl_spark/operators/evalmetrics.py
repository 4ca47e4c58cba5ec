"""Binary-classifier evaluation: exact AUC + threshold confusion report.

Model-eval over scored rows is a pipeline-native need (ranking a
filter model's scores, picking a quality-gate threshold). Both
metrics here are computed exactly, in one pass, with no sort of the
full data:

- **AUC** via the Mann-Whitney U statistic with average-rank tie
  handling, evaluated over the DISTINCT score values: group scores
  once (one shuffle, |distinct scores| rows out), then a cumulative
  window over that (small) value table. ``U2 = Σ_v p_v·(2·cumneg_v −
  n_v)`` is twice the U statistic and stays an exact BIGINT;
  ``AUC = U2 / (2·n_pos·n_neg)`` is a single final division.
  At 100 TB the expensive part is the per-value groupBy — the window
  runs over distinct values only. (BIGINT bound: needs
  2·n_pos·n_neg < 2^63, i.e. fine to ~2·10⁹ of each class.)
- **Confusion counts** at a caller-supplied threshold (predict
  positive when score >= threshold) are plain conditional sums in the
  same per-value pass; derived ratios (precision/recall/F1/accuracy)
  are single divisions of exact integers, rounded to 6.

Determinism: every intermediate is an exact BIGINT count; doubles
appear only in the final single-division ratios. Score equality is
bitwise (values come from the same storage on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 100.0,
) -> DataFrame:
    """Reliability-diagram data: bucket scores into ``n_bins``
    equal-width bins over [lo, hi) (scores outside the range clamp to
    the edge bins) and report, per non-empty bin, ``(bin, n, n_pos,
    mean_score, frac_pos, gap_micro)`` where ``gap_micro`` is
    |mean_score − frac_pos| in integer micro-units — the per-bin
    calibration error whose n-weighted sum is ECE.

    ``mean_score`` is on the raw score scale; the gap normalizes the
    mean to the [lo, hi) range first (p̂ = (s − lo)/(hi − lo)) so both
    sides of the subtraction are probabilities.

    Determinism discipline: scores are fixed to integer cents before
    any accumulation (Σ cents is an exact BIGINT regardless of
    partition order); the two doubles are the final single divisions,
    rounded at 6. ``gap_micro`` is pure BIGINT arithmetic over a
    common denominator — no float subtraction can wobble the hash.
    (BIGINT headroom: needs n·range_cents·10⁶ < 2^63, i.e. ~9·10⁸
    rows per bin at a 10⁴-cent range — aggregate upstream or shrink
    the range above that.)

    Scale shape: one groupBy on the bin id (≤ n_bins groups, map-side
    combined), nothing else. Rows with a null score or label are
    excluded, same contract as binary_eval_report.
    """
    if n_bins < 1:
        raise ValueError(f"calibration_report: n_bins must be >= 1, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"calibration_report: need hi > lo, got [{lo}, {hi})")
    width_cents = int(round((hi - lo) * 100)) // n_bins
    lo_cents = int(round(lo * 100))
    d = df.select(
        F.round(F.col(score_col) * 100).cast("long").alias("__c"),
        F.col(label_col).cast("long").alias("__y"),
    ).where(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
    raw_bin = (F.col("__c") - F.lit(lo_cents)).cast("long") / F.lit(width_cents)
    bin_id = F.least(
        F.lit(n_bins - 1).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.floor(raw_bin).cast("long")),
    )
    g = d.groupBy(bin_id.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__y").cast("long").alias("n_pos"),
        F.sum("__c").cast("long").alias("__sc"),
    )
    n, npos, sc = F.col("n"), F.col("n_pos"), F.col("__sc")
    range_cents = int(round(hi * 100)) - lo_cents
    # |p̂_mean − frac_pos|·10⁶ over the common denominator n·range:
    # p̂_mean = (sc − n·lo)/( n·range), frac_pos = n_pos/n.
    gap = (
        f"abs((__sc - n * {lo_cents}) * 1000000 "
        f"- n_pos * {range_cents} * 1000000) div (n * {range_cents})"
    )
    return g.select(
        "bin",
        "n",
        "n_pos",
        F.round(sc / (100.0 * n), 6).alias("mean_score"),
        F.round(npos / n.cast("double"), 6).alias("frac_pos"),
        F.expr(gap).alias("gap_micro"),
    )


def binary_eval_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    threshold: float,
) -> DataFrame:
    """One-row report: ``(n_pos, n_neg, auc, tp, fp, tn, fn, prec,
    rec, f1, acc)``.

    ``label_col`` must be 0/1 (ints); rows with a null score or label
    are excluded up front (a null score cannot be ranked; a null label
    is not a ground truth — same discipline as ab_test_report).
    """
    d = df.select(
        F.col(score_col).alias("__s"), F.col(label_col).cast("long").alias("__y")
    ).where(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())

    vals = d.groupBy("__s").agg(
        F.sum("__y").cast("long").alias("__p"),
        F.sum(F.lit(1) - F.col("__y")).cast("long").alias("__n"),
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = vals.withColumn("__cumneg", F.sum("__n").over(w))
    thr = F.lit(float(threshold))
    agg = cum.agg(
        F.sum("__p").cast("long").alias("n_pos"),
        F.sum("__n").cast("long").alias("n_neg"),
        F.sum(F.col("__p") * (2 * F.col("__cumneg") - F.col("__n"))).cast("long").alias("__u2"),
        F.sum(F.when(F.col("__s") >= thr, F.col("__p")).otherwise(F.lit(0))).cast("long").alias("tp"),
        F.sum(F.when(F.col("__s") >= thr, F.col("__n")).otherwise(F.lit(0))).cast("long").alias("fp"),
        F.sum(F.when(F.col("__s") < thr, F.col("__n")).otherwise(F.lit(0))).cast("long").alias("tn"),
        F.sum(F.when(F.col("__s") < thr, F.col("__p")).otherwise(F.lit(0))).cast("long").alias("fn"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(F.col("__u2") / (2.0 * F.col("n_pos") * F.col("n_neg")), 6),
        ).alias("auc"),
        "tp",
        "fp",
        "tn",
        "fn",
        F.when(F.col("tp") + F.col("fp") > 0, F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6)).alias("prec"),
        F.when(F.col("tp") + F.col("fn") > 0, F.round(F.col("tp") / (F.col("tp") + F.col("fn")), 6)).alias("rec"),
        F.when(
            2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            F.round(2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")), 6),
        ).alias("f1"),
        F.round(
            (F.col("tp") + F.col("tn"))
            / (F.col("tp") + F.col("tn") + F.col("fp") + F.col("fn")),
            6,
        ).alias("acc"),
    )


def lift_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Cumulative gains / decile-lift table: bucket rows by descending
    score into ``n_buckets`` value-grouped quantile buckets and report
    per bucket ``(bucket, n, n_pos, response_micro, cum_n, cum_pos,
    gain_micro, lift_micro)`` — gain = share of all positives captured
    down to this bucket, lift = that share over the share of rows.

    Scale design — NO global row sort: the naive decile (ntile over
    all rows) is a single-task total ranking at 100 TB. Instead rows
    group by DISTINCT score once (the q174 AUC shape), the cumulative
    walk runs on the small value table, and every row of a value gets
    the bucket where its value group STARTS — ties never split across
    buckets (same prediction → same treatment), so bucket sizes wobble
    by tie-group size while everything stays two map-side aggregates
    + one value-table window. Determinism: all counts exact BIGINTs;
    the micro ratios are integer divisions (lift in two documented
    truncation steps to keep headroom: (gain·cum-share-denominator)
    rather than a four-factor product).
    """
    if n_buckets < 1:
        raise ValueError(f"lift_table: n_buckets must be >= 1, got {n_buckets}")
    d = df.select(
        F.col(score_col).alias("__s"), F.col(label_col).cast("long").alias("__y")
    ).where(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
    vals = d.groupBy("__s").agg(
        F.count(F.lit(1)).cast("long").alias("__c"),
        F.sum("__y").cast("long").alias("__p"),
    )
    w = Window.orderBy(F.col("__s").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy(F.lit(1))
    staged = vals.select(
        "__s",
        "__c",
        "__p",
        (F.sum("__c").over(w) - F.col("__c")).alias("__before"),
        F.sum("__c").over(w_all).cast("long").alias("__n"),
        F.sum("__p").over(w_all).cast("long").alias("__np"),
    ).withColumn(
        "bucket", F.expr(f"__before * {n_buckets} div __n").cast("long")
    )
    g = staged.groupBy("bucket").agg(
        F.sum("__c").cast("long").alias("n"),
        F.sum("__p").cast("long").alias("n_pos"),
        F.max("__n").alias("__n"),
        F.max("__np").alias("__np"),
    )
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = g.select(
        "bucket",
        "n",
        "n_pos",
        F.expr("n_pos * 1000000 div n").alias("response_micro"),
        F.sum("n").over(w_cum).cast("long").alias("cum_n"),
        F.sum("n_pos").over(w_cum).cast("long").alias("cum_pos"),
        "__n",
        "__np",
    )
    return cum.select(
        "bucket",
        "n",
        "n_pos",
        "response_micro",
        "cum_n",
        "cum_pos",
        F.expr("CASE WHEN __np > 0 THEN cum_pos * 1000000 div __np END").alias(
            "gain_micro"
        ),
        F.expr(
            "CASE WHEN __np > 0 THEN "
            "(cum_pos * 1000000 div __np) * __n div cum_n END"
        ).alias("lift_micro"),
    )


def binary_eval_by_group(
    df: DataFrame,
    keys: list[str],
    score_col: str,
    label_col: str,
    threshold: float,
) -> DataFrame:
    """Per-group ``binary_eval_report``: one row per key group with
    the same exact Mann-Whitney AUC + threshold confusion columns —
    the per-segment model-eval every fairness/debugging pass needs.
    Identical integer discipline; the cumulative window runs on the
    per-group DISTINCT-score table, partitioned by the keys (one
    exchange)."""
    d = df.select(
        *keys,
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("long").alias("__y"),
    ).where(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
    vals = d.groupBy(*keys, "__s").agg(
        F.sum("__y").cast("long").alias("__p"),
        F.sum(F.lit(1) - F.col("__y")).cast("long").alias("__n"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = vals.withColumn("__cumneg", F.sum("__n").over(w))
    thr = F.lit(float(threshold))
    agg = cum.groupBy(*keys).agg(
        F.sum("__p").cast("long").alias("n_pos"),
        F.sum("__n").cast("long").alias("n_neg"),
        F.sum(F.col("__p") * (2 * F.col("__cumneg") - F.col("__n"))).cast("long").alias("__u2"),
        F.sum(F.when(F.col("__s") >= thr, F.col("__p")).otherwise(F.lit(0))).cast("long").alias("tp"),
        F.sum(F.when(F.col("__s") >= thr, F.col("__n")).otherwise(F.lit(0))).cast("long").alias("fp"),
        F.sum(F.when(F.col("__s") < thr, F.col("__n")).otherwise(F.lit(0))).cast("long").alias("tn"),
        F.sum(F.when(F.col("__s") < thr, F.col("__p")).otherwise(F.lit(0))).cast("long").alias("fn"),
    )
    return agg.select(
        *keys,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(F.col("__u2") / (2.0 * F.col("n_pos") * F.col("n_neg")), 6),
        ).alias("auc"),
        "tp",
        "fp",
        "tn",
        "fn",
    )


def cohen_kappa(
    df: DataFrame,
    a_col: str,
    b_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Cohen's kappa: chance-corrected agreement between two
    categorical labelers, per group — the inter-rater reliability
    standard for "do my two annotation passes / model generations
    agree beyond luck" (kappa = 1 perfect, 0 chance-level, < 0 worse
    than chance). Rows with a null on either side are excluded up
    front (documented discipline).

    Closed form over exact integers: with n rows, d = #agreements,
    and M = Σ_label rowmarginal·colmarginal,

        kappa = (n·d − M) / (n² − M)

    — numerator and denominator are exact DECIMAL(38,0) products of
    BIGINT counts (portable to HUGEINT), only the final division is
    double, rounded at 6; the degenerate pe = 1 case (n² == M, e.g.
    both raters constant) yields null. Observed agreement
    ``po`` = d/n rides along rounded at 6.

    Plan: one count aggregate per marginal (map-side combinable) +
    one agreement aggregate, joined on the LABEL key — the joined
    tables are label-cardinality, never fact-cardinality; no window,
    no driver data.
    """
    g = list(group_cols or [])
    work = df.select(
        *g, F.col(a_col).alias("__a"), F.col(b_col).alias("__b")
    ).filter(F.col("__a").isNotNull() & F.col("__b").isNotNull())
    totals = work.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("__a") == F.col("__b")).cast("long")).cast("long").alias("__d"),
    )
    ra = work.groupBy(*g, F.col("__a").alias("__lbl")).agg(
        F.count(F.lit(1)).cast("long").alias("__ra")
    )
    rb = work.groupBy(*g, F.col("__b").alias("__lbl")).agg(
        F.count(F.lit(1)).cast("long").alias("__rb")
    )
    join_keys = [*g, "__lbl"]
    marg = (
        ra.join(rb, join_keys, "full")
        .withColumn("__ra", F.coalesce(F.col("__ra"), F.lit(0)))
        .withColumn("__rb", F.coalesce(F.col("__rb"), F.lit(0)))
        .groupBy(*g)
        .agg(
            F.sum(
                F.col("__ra").cast("decimal(38,0)") * F.col("__rb").cast("decimal(38,0)")
            ).alias("__m")
        )
    )
    dec = "decimal(38,0)"
    j = totals.join(marg, g) if g else totals.crossJoin(marg)
    num = F.col("n").cast(dec) * F.col("__d").cast(dec) - F.col("__m")
    den = F.col("n").cast(dec) * F.col("n").cast(dec) - F.col("__m")
    return j.select(
        *g,
        F.col("n"),
        F.round(F.col("__d").cast("double") / F.col("n").cast("double"), 6).alias("po"),
        F.when(den > 0, F.round(num.cast("double") / den.cast("double"), 6)).alias(
            "kappa"
        ),
    )


def isotonic_fit(
    df: DataFrame,
    keys: list[str],
    pos_col: str,
    num_col: str,
    den_col: str,
    max_group_rows: int = 200,
) -> DataFrame:
    """Per-group isotonic (monotone non-decreasing) weighted
    regression of the rate ``num/den`` over the integer order
    ``pos_col`` — the PAV calibrator that turns a reliability diagram
    (q179) into a monotone score→probability map, and the standard
    post-hoc classifier calibration (Zadrozny-Elkan).

    NOT the sequential pool-adjacent-violators loop: this uses PAV's
    exact MAX-MIN CLOSED FORM —

        fitted_i = max_{j ≤ i} min_{k ≥ i} wavg(j..k)

    where wavg(j..k) = (ΣN_k − ΣN_{j−1})/(ΣD_k − ΣD_{j−1}) from
    exact BIGINT prefix sums. Every candidate average is ONE double
    division of two exact integers (identical on any engine), and
    max/min over a finite set of such doubles is order-independent —
    so the fit is deterministic without any iteration or UDF, the
    same declarative-closed-form trade the library makes for
    Kendall's tau and Theil-Sen: O(n³) membership rows on a BOUNDED
    group, with ``max_group_rows`` (default 200: ≤ 8M rows/group)
    enforced by a woven runtime guard. Calibration inputs are binned
    (n = #bins, typically ≤ 100), so the bound is generous.

    Requires distinct ``pos_col`` per group (it IS the x order) and
    positive ``den_col``; violations raise. Returns
    ``(*keys, pos, num, den, rate, fitted)`` with rate/fitted rounded
    at 6; fitted is non-decreasing in pos and minimizes the weighted
    SSE among monotone fits (PAV optimality).
    """
    from pyspark.sql import Window

    if not keys:
        # global fit: inject a literal grouping key so every window /
        # join below has a real column to hang on, drop it at the end
        df = df.withColumn("__grp", F.lit(0))
        out = isotonic_fit(df, ["__grp"], pos_col, num_col, den_col, max_group_rows)
        return out.drop("__grp")

    p = F.col(pos_col).cast("long")
    nm = F.col(num_col).cast("long")
    dn0 = F.col(den_col).cast("long")
    dn = F.when(
        dn0.isNull() | (dn0 <= 0) | nm.isNull() | p.isNull(),
        F.raise_error(
            F.lit(
                "isotonic_fit: pos/num must be non-null and den > 0 — "
                "aggregate to clean bins first"
            )
        ).cast("long"),
    ).otherwise(dn0)
    w_ord = Window.partitionBy(*keys).orderBy(F.col("__p").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy(*keys)
    base = (
        df.select(*keys, p.alias("__p"), nm.alias("__num"), dn.alias("__den"))
        .withColumn("__sn", F.sum("__num").over(w_ord))
        .withColumn("__sd", F.sum("__den").over(w_ord))
        .withColumn("__gn", F.count(F.lit(1)).over(w_all))
        .withColumn("__dup", F.count(F.lit(1)).over(Window.partitionBy(*keys, "__p")))
    )
    guard = F.when(
        (F.col("__gn") > int(max_group_rows)) | (F.col("__dup") > 1),
        F.raise_error(
            F.concat(
                F.lit("isotonic_fit: group exceeds max_group_rows="),
                F.lit(str(int(max_group_rows))),
                F.lit(" or duplicate pos values (pos must be a distinct order)"),
            )
        ).cast("long"),
    ).otherwise(F.col("__sn"))
    base = base.withColumn("__sn", guard).drop("__gn", "__dup")
    jj = base.select(
        *keys,
        F.col("__p").alias("__j"),
        (F.col("__sn") - F.col("__num")).alias("__snj"),
        (F.col("__sd") - F.col("__den")).alias("__sdj"),
    )
    kk = base.select(
        *keys, F.col("__p").alias("__k"), F.col("__sn").alias("__snk"),
        F.col("__sd").alias("__sdk"),
    )
    ii = base.select(*keys, F.col("__p").alias("__i"))
    intervals = jj.join(kk, keys).filter(F.col("__k") >= F.col("__j")).select(
        *keys, "__j", "__k",
        (
            (F.col("__snk") - F.col("__snj")).cast("double")
            / (F.col("__sdk") - F.col("__sdj")).cast("double")
        ).alias("__avg"),
    )
    member = intervals.join(ii, keys).filter(
        (F.col("__i") >= F.col("__j")) & (F.col("__i") <= F.col("__k"))
    )
    inner = member.groupBy(*keys, "__i", "__j").agg(F.min("__avg").alias("__mn"))
    outer = inner.groupBy(*keys, "__i").agg(F.max("__mn").alias("__fit"))
    return (
        base.join(
            outer.select(*keys, F.col("__i").alias("__p"), "__fit"), [*keys, "__p"]
        )
        .select(
            *keys,
            F.col("__p").alias("pos"),
            F.col("__num").alias("num"),
            F.col("__den").alias("den"),
            F.round(F.col("__num").cast("double") / F.col("__den").cast("double"), 6)
            .alias("rate"),
            F.round(F.col("__fit"), 6).alias("fitted"),
        )
    )


def brier_decomposition(
    df: DataFrame,
    prob_micro_col: str,
    y_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Murphy decomposition of the Brier score — the forecast-quality
    readout that splits squared error into WHY: Brier ≈ REL − RES +
    UNC, where reliability (miscalibration, lower better) and
    resolution (discrimination, higher better) are binned components
    and uncertainty is the outcome's own variance. Complements q179's
    reliability diagram (which shows the curve; this scores it) and
    q228's isotonic fit (which repairs it).

    Contract: probabilities arrive as exact integer MICRO-units
    (p·1e6 — the caller's quantization, same spirit as cents);
    ``y_col`` is 0/1, nulls raise (woven). Exactness: the exact
    per-row Brier term round((p − y)²·1e6) and every binned component
    term are snapped to micro from exact integer sums before their
    BIGINT totals — order-independent, engine-identical.

    Returns ONE row: (n, brier_micro, reliability_micro,
    resolution_micro, uncertainty_micro) — all ·1e6, with the binned
    identity brier ≈ rel − res + unc holding up to binning (exact
    when bins are homogeneous). Plan: one bin aggregate (≤ n_bins
    groups, map-side combined) + one scalar aggregate; no window, no
    join of row volumes.
    """
    if n_bins < 2:
        raise ValueError(f"brier_decomposition: n_bins must be >= 2, got {n_bins}")
    p0 = F.col(prob_micro_col).cast("long")
    y0 = F.col(y_col).cast("long")
    bad = p0.isNull() | (p0 < 0) | (p0 > 1_000_000) | y0.isNull() | ~y0.isin(0, 1)
    p = F.when(
        bad,
        F.raise_error(
            F.lit(
                "brier_decomposition: prob_micro must be in [0, 1e6] and y "
                "0/1, non-null — clean inputs first"
            )
        ).cast("long"),
    ).otherwise(p0)
    work = df.select(p.alias("__p"), y0.alias("__y")).withColumn(
        "__bin",
        F.least(
            F.lit(int(n_bins) - 1),
            F.expr(f"__p * {int(n_bins)} div 1000000"),
        ).cast("long"),
    )
    pd_ = F.col("__p").cast("double") / 1_000_000.0
    brier_term = F.round(
        (pd_ - F.col("__y").cast("double")) * (pd_ - F.col("__y").cast("double")) * 1_000_000.0
    ).cast("long")
    binned = work.withColumn("__bt", brier_term).groupBy("__bin").agg(
        F.count(F.lit(1)).cast("long").alias("__nk"),
        F.sum("__p").cast("long").alias("__sp"),
        F.sum("__y").cast("long").alias("__sy"),
        F.sum("__bt").cast("long").alias("__sbt"),
    )
    tot = binned.groupBy().agg(
        F.sum("__nk").cast("long").alias("__n"),
        F.sum("__sy").cast("long").alias("__sytot"),
        F.sum("__sbt").cast("long").alias("__sbtot"),
    )
    j = binned.crossJoin(F.broadcast(tot))
    nk = F.col("__nk").cast("double")
    pbar = F.col("__sp").cast("double") / nk / 1_000_000.0
    obar_k = F.col("__sy").cast("double") / nk
    obar = F.col("__sytot").cast("double") / F.col("__n").cast("double")
    rel_term = F.round(nk * (pbar - obar_k) * (pbar - obar_k) * 1_000_000.0).cast("long")
    res_term = F.round(nk * (obar_k - obar) * (obar_k - obar) * 1_000_000.0).cast("long")
    agg = j.groupBy().agg(
        F.max("__n").alias("n"),
        F.max("__sbtot").alias("__sb"),
        F.max("__sytot").alias("__sy"),
        F.sum(rel_term).cast("long").alias("__rel"),
        F.sum(res_term).cast("long").alias("__res"),
    )
    nd = F.col("n").cast("double")
    ob = F.col("__sy").cast("double") / nd
    return agg.select(
        F.col("n"),
        F.round(F.col("__sb").cast("double") / nd).cast("long").alias("brier_micro"),
        F.round(F.col("__rel").cast("double") / nd).cast("long").alias("reliability_micro"),
        F.round(F.col("__res").cast("double") / nd).cast("long").alias("resolution_micro"),
        F.round(ob * (F.lit(1.0) - ob) * 1_000_000.0).cast("long").alias("uncertainty_micro"),
    )


def threshold_sweep_f1(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Operating-point selection: sweep EVERY distinct score as the
    decision threshold (predict positive when score ≥ t) and report
    the confusion counts and F1 at each, flagging the argmax — the
    readout that turns q174's fixed-threshold confusion report and
    q248/AUC's threshold-free ranking into a deployable cutoff
    ("which score do we actually alert at").

    Engine shape (the km_risk_table device): ONE groupBy collapses the
    rows to the distinct-score frame with per-score (positives,
    negatives); suffix cumulative sums over that tiny frame (a window
    over distinct scores, never over the data) give tp/fp at every
    threshold simultaneously — O(n) + O(|scores|), not
    O(n·|scores|). All counts exact BIGINTs; F1 = 2tp/(2tp+fp+fn)
    is one division of exact integers, rounded to 6 (micro). The
    best row flags by max F1 with ties to the SMALLEST threshold
    (deterministic, oracle-replayable).

    Returns (threshold, tp, fp, fn, precision_micro, recall_micro,
    f1_micro, is_best), one row per distinct score. Scores must be
    integers (bucket upstream — a float score would sweep one
    threshold per distinct float, which is rarely what you want and
    equality across engines is bitwise anyway).
    """
    from pyspark.sql import Window

    d = df.select(
        F.col(score_col).cast("long").alias("__s"),
        F.col(label_col).cast("long").alias("__y"),
    )
    per = d.groupBy("__s").agg(
        F.sum(F.when(F.col("__y") == 1, 1).otherwise(0)).cast("long").alias("__p"),
        F.sum(F.when(F.col("__y") == 1, 0).otherwise(1)).cast("long").alias("__n"),
    )
    w_suf = Window.orderBy(F.col("__s").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = per.agg(F.sum("__p").cast("long").alias("__tp_all"))
    sw = (
        per.withColumn("tp", F.sum("__p").over(w_suf).cast("long"))
        .withColumn("fp", F.sum("__n").over(w_suf).cast("long"))
        .crossJoin(F.broadcast(tot))
        .withColumn("fn", (F.col("__tp_all") - F.col("tp")).cast("long"))
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")) * 1_000_000).cast("long"),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.round(F.col("tp") / (F.col("tp") + F.col("fn")) * 1_000_000).cast("long"),
    )
    f1 = F.when(
        F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        F.round(
            F.lit(2) * F.col("tp")
            / (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn"))
            * 1_000_000
        ).cast("long"),
    ).otherwise(F.lit(0))
    scored = sw.select(
        F.col("__s").alias("threshold"),
        "tp",
        "fp",
        "fn",
        prec.alias("precision_micro"),
        rec.alias("recall_micro"),
        f1.alias("f1_micro"),
    )
    w_best = Window.orderBy(F.col("f1_micro").desc(), F.col("threshold").asc())
    return scored.withColumn(
        "is_best", F.row_number().over(w_best) == 1
    )
