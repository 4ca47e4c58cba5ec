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
