"""Trailing-window distinct actives (rolling DAU/WAU/MAU).

The product-analytics staple Spark windows cannot express directly:
``COUNT(DISTINCT user)`` over a trailing N-day RANGE frame is not a
supported window aggregate, and the naive rewrite — self-joining each
report day against all activity in its lookback range — is a per-day
range join whose task size grows with corpus size.

The scale-safe shape used here is **bounded explode**: each distinct
(user, activity-day) pair is exploded into the ``window_days`` report
days it contributes to (constant fan-out = window length, independent
of data size), then a single distinct-count per report day. At 100 TB
that is one shuffle to dedupe (user, day) — dominated by the number of
user-days, not events — a map-side ×N explode, and one count-distinct
shuffle; no range join, no per-day scan.

Determinism: days are integer epoch-days (``datediff`` from
1970-01-01) so all bucket arithmetic is BIGINT; the rendered calendar
day is rebuilt from the integer, never from a session-zone instant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rolling_distinct_actives(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Per calendar day, the number of distinct users active within the
    trailing ``window_days`` days (the report day and the N-1 days
    before it). Report days are the days with at least one event —
    silent zero-rows for gap days are not emitted (callers wanting a
    dense calendar can outer-join a day spine).

    Returns ``(epoch_day BIGINT, day STRING 'yyyy-MM-dd',
    active_users BIGINT)``.

    Plan: distinct (user, day) → explode to the window_days report
    days each pair covers (fan-out = window_days, a constant) →
    broadcast-semi-join against the observed-day set → one
    count-distinct. No range join, no per-report-day rescan.
    """
    if window_days < 1:
        raise ValueError(f"rolling_distinct_actives: window_days must be >= 1, got {window_days}")
    ud = (
        df.select(
            F.col(user_col).alias("__u"),
            F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("__d"),
        )
        .where(F.col("__u").isNotNull() & F.col("__d").isNotNull())
        .distinct()
    )
    days = ud.select(F.col("__d").alias("epoch_day")).distinct()
    contrib = ud.select(
        "__u",
        F.explode(
            F.sequence(F.col("__d"), F.col("__d") + F.lit(int(window_days) - 1))
        ).alias("epoch_day"),
    )
    return (
        contrib.join(F.broadcast(days), "epoch_day")
        .groupBy("epoch_day")
        .agg(F.count_distinct("__u").cast("long").alias("active_users"))
        .select(
            "epoch_day",
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("epoch_day").cast("int")),
                "yyyy-MM-dd",
            ).alias("day"),
            "active_users",
        )
    )
