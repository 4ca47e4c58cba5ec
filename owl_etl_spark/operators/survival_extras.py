"""Restricted mean survival time (RMST) on top of the Kaplan-Meier
curve.

Round-10 wave 11. The KM curve (``survival.km_survival``) answers
"what fraction survives past t"; RMST answers the budget question —
"how much lifetime does a subject accrue, on average, in the first τ
units" — as the area under the KM step function up to τ. The
recommended effect scale when proportional hazards fails (where the
Cox HR of the q305 family stops being interpretable).

Exactness: event times are exact integers, so every step width is an
exact BIGINT; each step's area contribution is ONE snapped double
expression round(1e6·S(tᵢ)·width) of the engine-exact KM survival
(itself deterministic via the micro-nat log-sum device), summed
exactly; the pre-first-event segment at S = 1 is pure integer.

Plan: the KM curve's single shuffle + one lead window over the
event-time frame + one global aggregate — no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from owl_etl_spark.operators.survival import km_survival

_M = 1_000_000


def rmst(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    tau: int,
) -> DataFrame:
    """Area under the KM curve on [0, τ] for integer durations.

    Returns one row ``(tau, n_steps, rmst_micro)``:
    rmst = min(t₁, τ)·1 (the all-alive head segment) +
    Σ_{tᵢ<τ} S(tᵢ)·(min(tᵢ₊₁, τ) − tᵢ) with tᵢ₊₁ = τ for the last
    step (right-continuous step convention: the curve value AT tᵢ
    holds on [tᵢ, tᵢ₊₁)).

    ``tau`` must be positive; rmst is NULL on an empty frame.
    """
    if int(tau) <= 0:
        raise ValueError("rmst: tau must be positive")
    curve = km_survival(df, duration_col, event_col, keys=[])
    w = Window.orderBy(F.col("t").asc())
    c2 = curve.select(
        "t",
        "km_survival",
        F.lead("t").over(w).alias("__nt"),
    )
    width = (
        F.least(F.coalesce(F.col("__nt"), F.lit(int(tau))), F.lit(int(tau)))
        - F.col("t")
    ).cast("double")
    seg = F.when(
        F.col("t") < int(tau),
        F.round(F.lit(float(_M)) * F.col("km_survival") * width).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    g = c2.withColumn("__seg", seg).groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_steps"),
        F.sum("__seg").cast("long").alias("__ssum"),
        F.min("t").cast("long").alias("__t0"),
    )
    head = F.least(F.col("__t0"), F.lit(int(tau))) * _M
    return g.select(
        F.lit(int(tau)).cast("long").alias("tau"),
        "n_steps",
        F.when(F.col("n_steps") > 0, (head + F.col("__ssum")).cast("long")).alias(
            "rmst_micro"
        ),
    )
