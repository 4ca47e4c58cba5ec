"""Cohort retention: the acquisition-month × activity-age matrix.

The growth-analytics staple: group users by the period they first
appeared (their cohort), then for each later period count how many
came back — read along a row it's a cohort's decay curve, read down a
column it's product health at a given age. The reference has no
retention surface; this builds on the events table the way q162's
oracle replays it.

Determinism: periods are integer month indexes ((year−1970)·12 +
month−1) computed from TIMESTAMP_NTZ parts — no epoch division, no
timezone, no leap arithmetic; counts are exact distinct BIGINTs;
retention rides as integer micro-units (non-negative, truncating div
== floor everywhere).

Scale shape: one groupBy(user) for first-activity (map-side combined
min), one broadcast join of that user→cohort map... no — the
user→cohort map is user-cardinality, NOT broadcastable at 100 TB: the
join back to events is a key-partitioned equi-join on user_id (the
same shuffle any per-user enrichment pays), then ONE distinct over
(cohort, age, user) and a map-side-combined count per cell. Cell
count is bounded by months², not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _period_index(ts_col: str, dt: str) -> F.Column:
    """Integer month index from a timestamp column (NTZ-safe: uses
    calendar parts, never epoch seconds)."""
    return (
        (F.year(F.col(ts_col)) - 1970) * 12 + F.month(F.col(ts_col)) - 1
    ).cast("long")


def cohort_retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """One row per (cohort, age) cell that has any activity:
    ``(cohort_month, age_months, n_active, cohort_size,
    retention_micro)`` — ``cohort_month`` is the key's first activity
    month as 'YYYY-MM', ``age_months`` the whole-month offset of the
    activity period, ``n_active`` the exact distinct keys active in
    the cell, ``retention_micro`` = n_active·10⁶ div cohort_size.
    Every cohort's age-0 row exists by construction (first activity is
    activity) with retention_micro = 1000000.
    """
    dt = dict(df.dtypes)[ts_col]
    e = df.select(
        F.col(key_col).alias("__k"), _period_index(ts_col, dt).alias("__pm")
    ).filter(F.col("__k").isNotNull() & F.col("__pm").isNotNull())
    first = e.groupBy("__k").agg(F.min("__pm").alias("__cm"))
    sizes = first.groupBy("__cm").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    cells = (
        e.join(first, "__k")
        .select("__k", "__cm", "__pm")
        .distinct()
        .groupBy("__cm", "__pm")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return (
        cells.join(F.broadcast(sizes), "__cm")
        .select(
            F.format_string(
                "%04d-%02d",
                (F.lit(1970) + F.expr("__cm div 12")).cast("int"),
                (F.pmod("__cm", F.lit(12)) + 1).cast("int"),
            ).alias("cohort_month"),
            (F.col("__pm") - F.col("__cm")).cast("int").alias("age_months"),
            "n_active",
            "cohort_size",
            F.expr("n_active * 1000000 div cohort_size").alias("retention_micro"),
        )
    )


def geometric_ltv(
    df: DataFrame,
    user_col: str,
    period_col: str,
    revenue_col: str,
    horizon: int = 24,
) -> DataFrame:
    """Geometric lifetime-value projection per acquisition cohort —
    the closed-form LTV every retention deck quotes: with per-period
    retention r and revenue-per-retained-user ARPU, expected value
    over ``horizon`` periods is ARPU·(1 − r^H)/(1 − r) (the truncated
    geometric series — truncation stated; the r→1 limit is H·ARPU).

    Inputs are rows of (user, period index, revenue); a user's cohort
    is their FIRST period. Retention r̂ = returned_next/n₀ between the
    cohort's first and second periods (the standard single-step
    estimator — a full retention-curve model is q161's cohort table;
    this is the one-number projection on top). Integer discipline:
    r̂ and ARPU are exact floor-div micro values; the geometric series
    Σ r^t is evaluated as an exact integer fold in micro units inside ONE
    aggregate-lambda expression — each step fd(acc·r̂, 1e6) + 1e6 —
    so the oracle replays the same integer recurrence with
    list_reduce, and LTV = fd(ARPU·series, 1e6).

    Returns ``(cohort, n0, returned, retention_micro, arpu_micro,
    ltv_micro)``. Two aggregates + one broadcast scalar pass."""
    if horizon < 1:
        raise ValueError(f"geometric_ltv: horizon must be >= 1, got {horizon}")
    d = df.select(
        F.col(user_col).alias("__u"),
        F.col(period_col).cast("long").alias("__p"),
        F.col(revenue_col).cast("long").alias("__r"),
    ).filter(
        F.col("__u").isNotNull() & F.col("__p").isNotNull() & F.col("__r").isNotNull()
    )
    per_user = d.groupBy("__u").agg(
        F.min("__p").alias("__first"),
        F.sum("__r").cast("long").alias("__rev"),
    )
    ret = (
        d.join(per_user.select("__u", "__first"), "__u")
        .groupBy("__u", "__first")
        .agg(
            F.max((F.col("__p") == F.col("__first") + 1).cast("long"))
            .cast("long")
            .alias("__ret")
        )
    )
    base = (
        per_user.join(ret.select("__u", "__ret"), "__u")
        .groupBy(F.col("__first").alias("cohort"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n0"),
            F.sum("__ret").cast("long").alias("returned"),
            F.sum("__rev").cast("long").alias("__revsum"),
        )
    )
    fd = lambda x, dv: f"(({x}) - (((({x}) % ({dv})) + ({dv})) % ({dv}))) div ({dv})"
    staged = base.select(
        "cohort",
        "n0",
        "returned",
        F.expr(fd("returned * 1000000", "n0")).cast("long").alias("retention_micro"),
        F.expr(fd("__revsum * 1000000", "n0")).cast("long").alias("arpu_micro"),
    )
    # integer Horner for S = Σ_{t=0}^{H-1} r^t in micro as an
    # aggregate FOLD (a textual unroll would re-embed the accumulator
    # 3x per level through the floor-div macro — exponential SQL)
    step = fd("acc * retention_micro", "1000000")
    series = (
        f"aggregate(sequence(1, {int(horizon) - 1}), CAST(1000000 AS BIGINT), "
        f"(acc, t) -> ({step}) + 1000000)"
    )
    return staged.select(
        "cohort",
        "n0",
        "returned",
        "retention_micro",
        "arpu_micro",
        F.expr(fd(f"arpu_micro * ({series})", "1000000"))
        .cast("long")
        .alias("ltv_micro"),
    ).orderBy("cohort")
