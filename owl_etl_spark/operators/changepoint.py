"""Single change-point detection in a keyed series (binary
segmentation, one split).

``mean_changepoint`` finds, per key, the split position that best
separates a series into two mean-homogeneous segments — the first
step of binary segmentation and the standard "when did this metric
shift" readout behind deploy-regression hunts, pricing-change audits
and sensor-drift triage (the CUSUM family in operators/drift.py asks
"did it drift past a threshold"; this asks "where exactly").

For a split after position t, the within-segment SSE reduction over
a one-segment fit is

    gain(t) = S_l²/t + S_r²/(n−t) − S²/n

(S_l/S_r = prefix/suffix sums). The argmax needs only the first two
terms; the engine compares them as the EXACT floored integer

    gain_key(t) = (S_l²·(n−t) + S_r²·t) div (t·(n−t))

computed in DECIMAL(38,0) (numerator is always non-negative, so
floor = truncate on both engines — the verified `div`/`//` parity),
with ties at whole-unit² granularity broken to the EARLIEST split —
a total order, so the pick is deterministic and engine-portable; no
float enters the argmax. Overflow contract (same √(2^63) family as
``trend_report``): require n·max|v| < 3.03e9 — feed coarse integer
units for very long series.

Plan: ONE window pass per key (running sum + row number on one keyed
sort) and ONE aggregate taking min(struct(−gain_key, t, …)) — the
carried fields ride a comparison already decided by the unique
(−gain_key, t) prefix. No self-join, no driver data; per-key cost is
the sort the order statistics require.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mean_changepoint(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Best single mean-shift split per key. ``value_col`` must be
    integer-valued (pre-quantize floats to cents upstream); rows with
    a null value are excluded up front (documented discipline).
    Returns ``(keys..., n, split_pos, split_at, left_mean,
    right_mean, gain_units2)`` where the split is AFTER position
    ``split_pos`` (1-based; 1 <= split_pos < n), ``split_at`` is that
    row's ``order_col`` value, means are rounded at 6, and
    ``gain_units2`` is gain_key(t) − S² div n (each term exactly
    floored, so the reported gain is within 1 unit² of the true SSE
    reduction). Keys with fewer than 2 rows emit no row.
    """
    order = [F.col(order_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    v = F.col(value_col).cast("long")
    work = df.select(
        *keys,
        F.col(order_col).alias("__o"),
        *([F.col(tiebreak_col).alias("__tb")] if tiebreak_col is not None else []),
        v.alias("__v"),
    ).filter(F.col("__v").isNotNull())
    order = [F.col("__o").asc()] + (
        [F.col("__tb").asc()] if tiebreak_col is not None else []
    )
    w_run = Window.partitionBy(*keys).orderBy(*order)
    w_all = Window.partitionBy(*keys)
    ranked = work.select(
        *keys,
        "__o",
        F.row_number().over(w_run).cast("long").alias("__t"),
        F.sum("__v").over(w_run).cast("long").alias("__sl"),
        F.sum("__v").over(w_all).cast("long").alias("__s"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("__n"),
    )
    cand = ranked.filter(F.col("__t") < F.col("__n")).withColumn(
        "__gain_key",
        F.expr(
            "(CAST(__sl AS DECIMAL(38,0)) * __sl * (__n - __t)"
            " + CAST(__s - __sl AS DECIMAL(38,0)) * (__s - __sl) * __t)"
            " div (CAST(__t AS DECIMAL(38,0)) * (__n - __t))"
        ),
    )
    best = cand.groupBy(*keys).agg(
        F.min(
            F.struct(
                (-F.col("__gain_key")).alias("ng"),
                F.col("__t").alias("t"),
                F.col("__o").alias("o"),
                F.col("__sl").alias("sl"),
                F.col("__s").alias("s"),
                F.col("__n").alias("n"),
            )
        ).alias("__b")
    )
    b = F.col("__b")
    base_key = F.expr(
        "CAST(__b.s AS DECIMAL(38,0)) * __b.s div CAST(__b.n AS DECIMAL(38,0))"
    )
    return best.select(
        *keys,
        b.getField("n").alias("n"),
        b.getField("t").alias("split_pos"),
        b.getField("o").alias("split_at"),
        F.round(b.getField("sl").cast("double") / b.getField("t").cast("double"), 6).alias(
            "left_mean"
        ),
        F.round(
            (b.getField("s") - b.getField("sl")).cast("double")
            / (b.getField("n") - b.getField("t")).cast("double"),
            6,
        ).alias("right_mean"),
        ((-b.getField("ng")) - base_key).cast("long").alias("gain_units2"),
    )
