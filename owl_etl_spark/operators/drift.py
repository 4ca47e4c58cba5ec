"""Distribution-drift monitoring: PSI (population stability index)
between a reference window and a current window, per group.

A training-data pipeline re-ingesting monthly drops (the reference's
folder-per-month contract, src/etl/load.py:56-62) needs to know when a
feed's distribution moved before the model does. PSI is the standard
production monitor: bin the reference window, compute
``Σ (p_cur - p_ref) · ln(p_cur / p_ref)`` over the bins, alert at the
conventional 0.1 (drifting) / 0.25 (drifted) thresholds.

Determinism contract (what makes this oracle-checkable and
re-run-stable at 100 TB):
- bins are FIXED-WIDTH over the reference window's integer [min, max],
  assigned with pure integer arithmetic (``(v - lo) * n // span``) —
  no float edges, identical in any engine; current-window values
  outside the reference range clamp into the edge bins;
- proportions use add-one (Laplace) smoothing so empty bins never
  produce ln(0) — deterministic, parameter-free;
- each bin's PSI term is snapped to integer MICRO-nats before the
  sum (the q104 unigram-cost trick): the only float op is one ln +
  two divisions per (group, bin), fixed evaluation order, and the
  cross-bin accumulation is exact BIGINT addition in any order.

Plan shape: one aggregate over each window (map-side combined), a
broadcast join against the per-group bounds (one row per group), a
dense bin grid generated per group (sequence + explode, n_bins rows
per group), and one final keyed aggregate. No windows, no sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    keys: list[str],
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-group PSI of ``cur`` vs ``ref`` over integer ``value_col``.

    Returns one row per group: n_ref, n_cur, psi_micro_nats (BIGINT,
    PSI · 1e6), and the conventional drift verdict string
    ('stable' < 0.1 <= 'drifting' < 0.25 <= 'drifted')."""
    bounds = ref.groupBy(*keys).agg(
        F.min(value_col).cast("long").alias("__lo"),
        F.max(value_col).cast("long").alias("__hi"),
    )

    def _binned(df: DataFrame, out: str) -> DataFrame:
        j = df.join(F.broadcast(bounds), keys)
        # integer division: positives truncate identically in every
        # engine; below-range negatives clamp to bin 0 either way
        b = F.least(
            F.lit(n_bins - 1),
            F.greatest(F.lit(0), F.expr(f"((CAST({value_col} AS BIGINT) - __lo) * {n_bins}) div (__hi - __lo + 1)")),
        )
        return j.groupBy(*keys, b.alias("bin")).agg(
            F.count(F.lit(1)).cast("long").alias(out)
        )

    rc, cc = _binned(ref, "n_ref"), _binned(cur, "n_cur")
    grid = bounds.select(
        *keys, F.explode(F.expr(f"sequence(0, {n_bins - 1})")).alias("bin")
    ).withColumn("bin", F.col("bin").cast("long"))
    cells = (
        grid.join(rc, [*keys, "bin"], "left")
        .join(cc, [*keys, "bin"], "left")
        .select(
            *keys,
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    totals = cells.groupBy(*keys).agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    pr = (F.col("n_ref") + 1) / (F.col("__tr") + n_bins)
    pc = (F.col("n_cur") + 1) / (F.col("__tc") + n_bins)
    term = F.round((pc - pr) * F.log(pc / pr) * 1_000_000).cast("long")
    psi = (
        cells.join(F.broadcast(totals), keys)
        .withColumn("__term", term)
        .groupBy(*keys)
        .agg(
            F.sum("n_ref").cast("long").alias("n_ref"),
            F.sum("n_cur").cast("long").alias("n_cur"),
            F.sum("__term").cast("long").alias("psi_micro_nats"),
        )
    )
    verdict = (
        F.when(F.col("psi_micro_nats") < 100_000, "stable")
        .when(F.col("psi_micro_nats") < 250_000, "drifting")
        .otherwise("drifted")
    )
    # Groups present ONLY in the current window have no reference bins
    # to compare against — but silently dropping them would make the
    # monitor report nothing for the MOST drifted case (a brand-new
    # segment in the feed). Emit them explicitly.
    new_groups = (
        cur.groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias("n_cur"))
        .join(bounds.select(*keys), keys, "left_anti")
        .select(
            *keys,
            F.lit(0).cast("long").alias("n_ref"),
            "n_cur",
            F.lit(None).cast("long").alias("psi_micro_nats"),
            F.lit("new_segment").alias("verdict"),
        )
    )
    return psi.withColumn("verdict", verdict).unionByName(new_groups)
