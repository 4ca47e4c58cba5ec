"""Structured Streaming windowed aggregations.

The reference is strictly batch (SURVEY.md §2.10): monthly folder
drops, manual script runs. These operators are the streaming form of
the same semantics — the batch queries (q15 hourly agg, q16
sessionization) expressed over an unbounded source with watermarks.

Designed so the SAME transformation works under
``trigger(availableNow=True)`` for incremental batch (the Spark-native
version of the reference's "process this month's folder" contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling 1-hour window counts/sums per event_type with late-data
    tolerance ``watermark``. Works on both streaming and batch frames
    (batch ignores the watermark)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.window(F.col(ts_col), "1 hour").alias("win"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "event_type",
        "n_events",
        "total_value",
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per user — the streaming twin of
    ``operators.sessionize`` using the native ``session_window``
    (state is bounded by the watermark; no custom state needed)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("win"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events")).select(
        F.col("win.start").alias("session_start"),
        F.col("win.end").alias("session_end"),
        "user_id",
        "n_events",
    )


def sliding_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """HOPPING (sliding) window counts/sums per event_type: each event
    contributes to window/slide overlapping windows (4 with the
    defaults) — the trailing-hour-updated-every-15-min dashboards and
    rate limiters want. Same watermark-bounded state as the tumbling
    form; state size scales by the overlap factor (window/slide), so
    keep the slide a sane fraction of the window at 100 TB-scale
    streams. Works on streaming and batch frames alike."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.window(F.col(ts_col), window, slide).alias("win"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "event_type",
        "n_events",
        "total_value",
    )
