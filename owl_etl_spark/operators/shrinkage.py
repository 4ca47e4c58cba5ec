"""Empirical-Bayes rate shrinkage (beta-binomial moment matching) —
the small-sample fix every per-group rate report needs: a group with
2/3 successes should NOT outrank one with 180/300, yet raw rates say
so. Fitting a Beta(α, β) prior to the observed rate spread and
reporting the posterior mean

    shrunk = (y + α) / (n + α + β)

pulls small groups toward the global rate exactly as hard as their
evidence is weak — the technique behind every "adjusted CTR" /
"Bayesian average rating" column.

Moment matching (the classic closed form): with m and v the mean and
variance of raw group rates, α+β = m(1−m)/v − 1 and α = m(α+β).
Integer discipline: group rates are exact floor-div micro units; m,
v, α, α+β all live in micro with exact BIGINT sums and one floor
division per step, so the whole fit replays in SQL. Degenerate
spread (v ≈ 0 → prior strength → ∞) is clamped by max(v, 1), which
collapses every group to the global mean — the mathematically right
limit, stated in the output rather than special-cased away.

Scale shape: one (group) aggregate over the data; the prior fit is a
second aggregate over GROUP-sized rows; the shrunk column is a
broadcast-scalar map."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _fd(x: str, d: str) -> str:
    return f"(({x}) - (((({x}) % ({d})) + ({d})) % ({d}))) div ({d})"


def eb_shrunk_rates(
    df: DataFrame,
    group_col: str,
    success_col: str,
) -> DataFrame:
    """Per-group shrunk success rates: ``(group, n, y, rate_micro,
    shrunk_micro)`` with a Beta prior moment-matched across groups
    (see module docstring). ``success_col`` must be 0/1 integers;
    needs ≥ 2 groups (raises otherwise — no spread, no prior)."""
    d = df.select(
        F.col(group_col).cast("string").alias("__g"),
        F.col(success_col).cast("long").alias("__s"),
    ).filter(F.col("__g").isNotNull() & F.col("__s").isNotNull())
    g = d.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__s").cast("long").alias("y"),
    ).withColumn("rate_micro", F.expr(_fd("y * 1000000", "n")).cast("long"))
    prior = g.agg(
        F.count(F.lit(1)).cast("long").alias("__G"),
        F.sum("rate_micro").cast("long").alias("__sr"),
        F.sum(F.col("rate_micro") * F.col("rate_micro")).cast("long").alias("__srr"),
    ).select(
        "__G",
        F.expr(_fd("__sr", "__G")).cast("long").alias("__m"),
        # var in micro²-of-micro: fd(Σr² − fd((Σr)², G), G−1) then
        # down to micro via the 1e6 divide folded into the α formula
        F.expr(
            _fd(f"__srr - ({_fd('__sr * __sr', '__G')})", "greatest(__G - 1, 1)")
        )
        .cast("long")
        .alias("__v2"),
    ).withColumn(
        # the guard is woven into __m (a column every consumer reads)
        # — hanging it on __G gets column-pruned away silently
        "__m",
        F.when(
            F.col("__G") < 2,
            F.raise_error(
                F.lit("eb_shrunk_rates: need >= 2 groups to fit a prior")
            ).cast("long"),
        ).otherwise(F.col("__m")),
    )
    # ab = m(1e6−m)/v − 1e6  (all micro; __v2 is micro², so the 1e6
    # numerator scale cancels one micro)
    withab = prior.select(
        "__m",
        # ab_micro = fd(m(1e6−m)·1e6, v2) − 1e6: the 1e6 multiplies
        # BEFORE the division so the prior strength keeps micro
        # resolution (m(1e6−m)·1e6 ≤ 2.5·10¹⁷ — BIGINT-safe). The
        # 1e12 cap bounds the zero-spread limit (prior strength 10⁶
        # in natural units ≡ "everything at the mean" already) and
        # keeps m·ab inside BIGINT; the oracle carries the same cap.
        F.expr(
            f"least(greatest(({_fd('__m * (1000000 - __m) * 1000000', 'greatest(__v2, 1)')})"
            " - 1000000, 0), 1000000000000)"
        )
        .cast("long")
        .alias("__ab"),
    ).select(
        "__m",
        "__ab",
        F.expr(_fd("__m * __ab", "1000000")).cast("long").alias("__alpha"),
    )
    return (
        g.crossJoin(F.broadcast(withab))
        .select(
            F.col("__g").alias("group"),
            "n",
            "y",
            "rate_micro",
            F.expr(
                _fd("(y * 1000000 + __alpha) * 1000000", "n * 1000000 + __ab")
            )
            .cast("long")
            .alias("shrunk_micro"),
        )
        .orderBy("group")
    )
