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
