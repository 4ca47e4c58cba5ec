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

from pyspark.sql import DataFrame, Window
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


def interarrival_report(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak_col: str,
    min_events: int = 3,
) -> DataFrame:
    """Per-key inter-arrival-time statistics — the burstiness readout
    behind bot detection (metronomic gaps → CV ≈ 0), engagement
    profiling, and arrival-process sanity checks (Poisson traffic has
    CV ≈ 1; humans batch, so real users sit above).

    For each key with at least ``min_events`` events: gaps between
    consecutive events (ordered by (ts, tiebreak) — the tiebreaker
    makes the sort total, so gaps are reproducible under equal
    timestamps), in WHOLE SECONDS via floor-division of the exact
    microsecond deltas. Emits ``(*keys, n_gaps, mean_gap_s, cv,
    burstiness)``:

    - mean_gap_s = Σg / n                      (rounded at 6)
    - cv         = σ/μ = √(n·Σg² − (Σg)²) / Σg (population σ; null
                                                when Σg = 0 — all
                                                events same second)
    - burstiness = (σ − μ)/(σ + μ)  ∈ [−1, 1)  (Goh-Barabási B;
                   −1 metronome, 0 Poisson, →1 extreme batching;
                   null when Σg = 0)

    Moment sums Σg and Σg² are exact BIGINTs (order-independent,
    engine-portable); with second-grain gaps the BIGINT bound allows
    ~10⁶ gaps per key at month-long spans — far beyond any real
    per-user event count, and a second-grain choice the docheader
    calls out precisely because MICROSECOND gaps squared would
    overflow at ~3 gaps. The σ/μ/B divisions are single IEEE double
    ops on exact integers, rounded at 6.

    Plan: one window (lag over the keyed sort) + one groupBy on the
    SAME keys — Catalyst plans a single shuffle; no join, no explode.
    """
    ty = dict(df.dtypes).get(ts_col, "")
    if ty == "timestamp_ntz":
        # NTZ has no epoch cast; timestampdiff vs the NTZ epoch is the
        # timezone-proof form (module convention, cf. sessionize.py).
        us = F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        )
    elif ty.startswith("timestamp"):
        us = F.unix_micros(F.col(ts_col))
    else:
        us = F.col(ts_col).cast("long") * F.lit(1_000_000)
    gap = F.expr("(__us - __prev_us) div 1000000")
    work = (
        df.select(
            *keys,
            us.alias("__us"),
            F.col(tiebreak_col).alias("__tb"),
        )
        .withColumn(
            "__prev_us",
            F.lag("__us").over(
                Window.partitionBy(*keys).orderBy(F.col("__us").asc(), F.col("__tb").asc())
            ),
        )
        .filter(F.col("__prev_us").isNotNull())
        .select(*keys, gap.alias("__g"))
    )
    agg = work.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("__g").cast("long").alias("__sg"),
        F.sum(F.col("__g") * F.col("__g")).cast("long").alias("__sgg"),
    ).filter(F.col("n_gaps") >= int(min_events) - 1)
    nd = F.col("n_gaps").cast("double")
    var_t = (
        F.col("n_gaps") * F.col("__sgg") - F.col("__sg") * F.col("__sg")
    ).cast("double")
    sg = F.col("__sg").cast("double")
    sigma = F.sqrt(var_t) / nd
    mu = sg / nd
    return agg.select(
        *keys,
        F.col("n_gaps"),
        F.round(mu, 6).alias("mean_gap_s"),
        F.when(F.col("__sg") > 0, F.round(F.sqrt(var_t) / sg, 6)).alias("cv"),
        F.when(
            F.col("__sg") > 0, F.round((sigma - mu) / (sigma + mu), 6)
        ).alias("burstiness"),
    )
