"""Seasonal-baseline anomaly detection: exact per-(key, season)
mean/std profiles and per-row residual z-scores.

The monitoring pattern every event warehouse ends up hand-rolling:
"is this hour's value unusual FOR THIS HOUR OF DAY" — a flat
mean/std flags every rush hour as an anomaly, so the baseline must be
seasonal (hour-of-day, day-of-week, both). This operator takes any
caller-provided season column, so composing seasonality is a select
expression, not an operator change.

Determinism (q59's exact-variance pattern): the profile accumulates
Σv and Σv² as exact BIGINT sums of integer units (feed cents), so the
classic sum-of-squares variance is order-independent and
engine-identical — unlike built-in var_samp/stddev, whose streaming
accumulation differs per engine and partitioning. The only doubles
are the final mean/std/z divisions, rounded at 6.

Caller contract (overflow + conditioning): n·max(v²) per (key,
season) must fit BIGINT — |v| ≤ 1e6 (cents up to $10k) supports ~9e6
rows per cell; rescale coarser above that. The sum-of-squares form
loses precision when std ≪ |mean| (catastrophic cancellation in
s2 − s1²/n): with integer inputs both engines cancel IDENTICALLY, so
the gate stays exact, but z-scores of a near-constant series are
numerically meaningless — as they are statistically.

Plan shape: ONE shuffle builds the profile (keys × seasons rows — 24
per key for hour-of-day; partial aggregation collapses map-side), and
the profile broadcast-joins back to the rows. A 100 TB events table
is never shuffled row-wise: the z computation is a map expression
after the broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seasonal_profile(
    df: DataFrame, keys: list[str], season_col: str, value_col: str
) -> DataFrame:
    """(keys..., season, n, s1, s2): the exact integer sums a seasonal
    baseline needs — mergeable across drops by adding n/s1/s2 (the
    q107 algebraic-rollup contract), so the baseline can be maintained
    incrementally."""
    v = F.col(value_col).cast("long")
    return df.groupBy(*keys, season_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).cast("long").alias("s1"),
        F.sum(v * v).cast("long").alias("s2"),
    )


def seasonal_zscore(
    df: DataFrame,
    keys: list[str],
    season_col: str,
    value_col: str,
    z_threshold: float = 3.0,
    profile: DataFrame | None = None,
) -> DataFrame:
    """Every input row annotated with ``z`` (residual z-score against
    its (key, season) baseline, rounded at 6; null when the cell has
    n < 2 or zero variance) and ``is_anomaly`` (|z| ≥ threshold; false
    when z is null).

    ``profile``: pass a pre-built/merged ``seasonal_profile`` to score
    a NEW drop against HISTORY's baseline (the streaming-adjacent
    form); default scores the frame against itself.
    """
    prof = profile if profile is not None else seasonal_profile(df, keys, season_col, value_col)
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    var_num = s2 - s1 * s1 / n
    z_raw = (F.col(value_col).cast("double") - s1 / n) / F.sqrt(var_num / (n - 1))
    z = F.when((F.col("n") >= 2) & (var_num > 0), F.round(z_raw, 6))
    return (
        df.join(F.broadcast(prof), [*keys, season_col])
        .withColumn("z", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("z")) >= F.lit(float(z_threshold)), F.lit(False)),
        )
        .drop("n", "s1", "s2")
    )
