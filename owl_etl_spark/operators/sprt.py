"""Wald's sequential probability ratio test (SPRT) — the
early-stopping A/B monitor, exactly.

Fixed-horizon tests (profile.ab_test_report's Welch readout, q144)
answer "is B better" only after the full sample; the SPRT answers it
AS DATA ARRIVES: the running log-likelihood ratio walk crosses an
upper boundary → accept H1 (rate moved to p1), lower → accept H0
(still p0), else keep sampling — with guaranteed error rates (α, β)
at minimal expected sample size (Wald's optimality).

For Bernoulli observations the walk is beautifully discrete: each
observation adds one of exactly TWO constants,

    y=1:  ln(p1/p0)            y=0:  ln((1-p1)/(1-p0))

so the engine snaps both constants to integer micro-nats ONCE (Python
driver-side, embedded as literals — the same literal-generation trick
as the seeded hyperplanes/minhash coefficients) and the entire walk
is an exact BIGINT running sum over the keyed event order: no float
accumulation, identical on any engine, reproducible under any
partitioning. Boundaries A = ln((1-β)/α), B = ln(β/(1-α)) are the
same kind of micro-nat literal.

The decision is the FIRST boundary crossing — a running-extremum
question, not a loop: the earliest row index where the walk exits
(B, A), found with one conditional min over the same window pass.

Plan: one window (running sum + running row number over the keyed
(order, tiebreak) total order) + one per-key aggregate on the same
keys = a single shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sprt_constants(
    p0: float, p1: float, alpha: float = 0.05, beta: float = 0.2
) -> dict[str, int]:
    """The four micro-nat integer literals of a Bernoulli SPRT:
    ``inc1``/``inc0`` (per-observation LLR increments for y=1/y=0)
    and ``upper``/``lower`` (accept-H1 / accept-H0 boundaries).
    Computed once driver-side with round-half-away — both engines
    receive identical literals."""
    if not (0 < p0 < 1 and 0 < p1 < 1 and p0 != p1):
        raise ValueError(f"sprt_constants: need 0<p0,p1<1 and p0!=p1, got {p0}, {p1}")
    if not (0 < alpha < 1 and 0 < beta < 1):
        raise ValueError(f"sprt_constants: need 0<alpha,beta<1, got {alpha}, {beta}")

    def micro(x: float) -> int:
        return int(math.floor(abs(x) * 1e6 + 0.5)) * (1 if x >= 0 else -1)

    return {
        "inc1": micro(math.log(p1 / p0)),
        "inc0": micro(math.log((1 - p1) / (1 - p0))),
        "upper": micro(math.log((1 - beta) / alpha)),
        "lower": micro(math.log(beta / (1 - alpha))),
    }


def sprt_monitor(
    df: DataFrame,
    keys: list[str],
    y_col: str,
    order_col: str,
    tiebreak_col: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
) -> DataFrame:
    """Run the Bernoulli SPRT over each key's observation stream
    (ordered by (order_col, tiebreak_col) — total order). ``y_col``
    must be 0/1; nulls raise (a skipped observation shifts every
    later boundary crossing). Returns one row per key:
    ``(*keys, n, n_pos, llr_micro, decision, n_at_decision)`` where
    decision ∈ {'accept_h1', 'accept_h0', 'continue'} from the FIRST
    boundary crossing and n_at_decision is the 1-based observation
    index of that crossing (null while 'continue')."""
    c = sprt_constants(p0, p1, alpha=alpha, beta=beta)
    y0 = F.col(y_col).cast("long")
    y = F.when(
        y0.isNull() | ~y0.isin(0, 1),
        F.raise_error(
            F.lit(
                f"sprt_monitor: {y_col} must be 0/1 and non-null — a skipped "
                "observation shifts every later crossing"
            )
        ).cast("long"),
    ).otherwise(y0)
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).asc(), F.col(tiebreak_col).asc()
    )
    inc = F.when(F.col("__y") == 1, F.lit(c["inc1"])).otherwise(F.lit(c["inc0"]))
    staged = (
        df.select(*keys, F.col(order_col), F.col(tiebreak_col), y.alias("__y"))
        .withColumn("__i", F.row_number().over(w).cast("long"))
        .withColumn("__llr", F.sum(inc).over(w).cast("long"))
    )
    cross_hi = F.when(F.col("__llr") >= c["upper"], F.col("__i"))
    cross_lo = F.when(F.col("__llr") <= c["lower"], F.col("__i"))
    agg = staged.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__y").cast("long").alias("n_pos"),
        F.min(cross_hi).cast("long").alias("__hi_at"),
        F.min(cross_lo).cast("long").alias("__lo_at"),
    )
    # final LLR needs no last(): increments are constant per outcome,
    # so it is exactly n_pos·inc1 + (n − n_pos)·inc0
    llr = (
        F.col("n_pos") * F.lit(c["inc1"])
        + (F.col("n") - F.col("n_pos")) * F.lit(c["inc0"])
    ).cast("long")
    first_cross = F.least(
        F.coalesce(F.col("__hi_at"), F.lit(2**62)),
        F.coalesce(F.col("__lo_at"), F.lit(2**62)),
    )
    decision = F.when(
        F.col("__hi_at").isNull() & F.col("__lo_at").isNull(), F.lit("continue")
    ).otherwise(
        F.when(
            F.coalesce(F.col("__hi_at"), F.lit(2**62))
            <= F.coalesce(F.col("__lo_at"), F.lit(2**62)),
            F.lit("accept_h1"),
        ).otherwise(F.lit("accept_h0"))
    )
    n_at = F.when(
        F.col("__hi_at").isNotNull() | F.col("__lo_at").isNotNull(), first_cross
    ).cast("long")
    return agg.select(
        *keys,
        "n",
        "n_pos",
        llr.alias("llr_micro"),
        decision.alias("decision"),
        n_at.alias("n_at_decision"),
    )
