"""Markov removal-effect attribution — the data-driven fourth
convention of the attribution suite, with a bounded-steps INTEGER
recurrence both engines can replay.

q142 (linear), q168 (U-shaped) and q215 (time-decay) share one
weakness: the credit rule is chosen, not learned. The Markov model
learns it — build the first-order journey chain (start → touches →
conversion/null), and a channel's value is its REMOVAL EFFECT
(Anderl et al. 2014): how much does the start→conversion probability
drop when every path through that channel is cut? Channels whose
removal barely moves conversion were free riders, whatever the
positional rules said.

Exact bounded semantics instead of "solve to convergence":
absorption is computed as P(convert within ``max_steps`` hops) by
the recurrence

    a_t(s) = P(s→conv) + Σ_q P(s→q) · a_{t-1}(q)

run entirely in integer micro-units: transition probabilities are
floor(1e6·count/rowsum) (exact rationals floored once), each product
is (P·a) div 1e6, and ``max_steps`` is part of the operator's
declared meaning (the q244 bounded-horizon trade — geometric
convergence makes 24 steps ≈ the fixed point for any real funnel,
but the CONTRACT is the bounded value, so both engines agree
bit-for-bit with no convergence judgment call). The removal variants
run the SAME recurrence with the removed channel's outgoing row
zeroed — all channels at once, as a (state × removed) table.

Distribution of labor (the centroids/codebooks precedent): counting
transitions is the distributed part — one lead() window over every
journey + one groupBy, volumes = events. The recurrence then runs on
the collected (states+2)² count matrix — driver-sized by definition
(channel vocabularies are tiny) — in exact Python integers, and the
result returns as a DataFrame. q249's oracle replays BOTH phases in
SQL: the same window/groupBy counts and the same ``max_steps``
unrolled integer recurrence with a 'removed' dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

START = "__start__"
CONV = "__conv__"
NULL_END = "__null__"


def markov_transition_counts(
    touches: DataFrame,
    key_col: str,
    channel_col: str,
    order_col: str,
    tiebreak_col: str,
    converted_col: str,
) -> DataFrame:
    """Per-journey first-order transition counts: one row per
    (src, dst) with its exact BIGINT count. ``touches`` holds one row
    per touch with the journey key, channel, total order columns, and
    a per-row 0/1 ``converted_col`` (constant within a key —
    whether this journey ended in conversion). Emits start→first,
    touch→touch, and last→conv/null transitions."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col).asc(), F.col(tiebreak_col).asc()
    )
    staged = touches.select(
        F.col(key_col).alias("__k"),
        F.col(channel_col).cast("string").alias("__c"),
        F.col(converted_col).cast("long").alias("__conv"),
        F.lag(F.col(channel_col).cast("string")).over(
            Window.partitionBy(key_col).orderBy(
                F.col(order_col).asc(), F.col(tiebreak_col).asc()
            )
        ).alias("__prev"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(key_col)).alias("__n"),
    )
    mids = staged.select(
        F.coalesce(F.col("__prev"), F.lit(START)).alias("src"),
        F.col("__c").alias("dst"),
    )
    ends = staged.filter(F.col("__rn") == F.col("__n")).select(
        F.col("__c").alias("src"),
        F.when(F.col("__conv") == 1, F.lit(CONV)).otherwise(F.lit(NULL_END)).alias("dst"),
    )
    return (
        mids.unionAll(ends)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _absorption_micro(
    counts: list[tuple[str, str, int]], removed: str | None, max_steps: int
) -> int:
    """Exact integer recurrence: P(start→conv within max_steps) in
    micro-units, with ``removed``'s outgoing row zeroed (its
    journeys dead-end — the removal semantics)."""
    from collections import defaultdict

    out: dict[str, list[tuple[str, int]]] = defaultdict(list)
    rowsum: dict[str, int] = defaultdict(int)
    for s, d, c in counts:
        rowsum[s] += c
    for s, d, c in counts:
        out[s].append((d, c))
    a: dict[str, int] = defaultdict(int)  # a_0 = 0 everywhere
    for _ in range(max_steps):
        nxt: dict[str, int] = {}
        for s in rowsum:
            if removed is not None and s == removed:
                nxt[s] = 0
                continue
            acc = 0
            for d, c in out[s]:
                p = (1_000_000 * c) // rowsum[s]
                if d == CONV:
                    acc += p
                elif d in (NULL_END,):
                    continue
                else:
                    acc += (p * a[d]) // 1_000_000
            nxt[s] = acc
        a = defaultdict(int, nxt)
    return a[START]


def markov_removal_attribution(
    touches: DataFrame,
    key_col: str,
    channel_col: str,
    order_col: str,
    tiebreak_col: str,
    converted_col: str,
    max_steps: int = 24,
) -> DataFrame:
    """Removal-effect attribution over the journey chain. Returns one
    row per channel: ``(channel, base_conv_micro, removed_conv_micro,
    removal_effect_micro, share_micro)`` where removal_effect =
    base − removed (how much conversion the channel carries) and
    share normalizes effects over channels (largest-remainder to sum
    exactly to 1e6; zero-total effect ⇒ null shares). The count
    phase is fully distributed; the (states+2)² recurrence runs
    driver-side in exact integers (driver-sized by definition —
    channel vocabularies are tiny; > 1000 channels raises)."""
    if max_steps < 1:
        raise ValueError(f"markov_removal_attribution: max_steps >= 1, got {max_steps}")
    tc = markov_transition_counts(
        touches, key_col, channel_col, order_col, tiebreak_col, converted_col
    )
    rows = [(r["src"], r["dst"], r["cnt"]) for r in tc.collect()]
    channels = sorted(
        {s for s, _, _ in rows if s not in (START,)}
        | {d for _, d, _ in rows if d not in (CONV, NULL_END)}
    )
    if len(channels) > 1000:
        raise ValueError(
            f"markov_removal_attribution: {len(channels)} channels — the "
            "recurrence matrix is no longer driver-sized; bucket channels first"
        )
    base = _absorption_micro(rows, None, int(max_steps))
    effects = []
    for ch in channels:
        removed = _absorption_micro(rows, ch, int(max_steps))
        effects.append((ch, base, removed, max(0, base - removed)))
    total = sum(e[3] for e in effects)
    out = []
    if total > 0:
        floors = [(1_000_000 * e[3]) // total for e in effects]
        rems = [(1_000_000 * e[3]) % total for e in effects]
        give = 1_000_000 - sum(floors)
        order = sorted(
            range(len(effects)), key=lambda i: (-rems[i], effects[i][0])
        )
        bump = set(order[:give])
        for i, (ch, b, r, eff) in enumerate(effects):
            out.append((ch, b, r, eff, floors[i] + (1 if i in bump else 0)))
    else:
        for ch, b, r, eff in effects:
            out.append((ch, b, r, eff, None))
    spark = touches.sparkSession
    from owl_etl_spark.session import literal_frame

    return literal_frame(
        spark,
        out,
        "channel string, base_conv_micro long, removed_conv_micro long, "
        "removal_effect_micro long, share_micro long",
    )
