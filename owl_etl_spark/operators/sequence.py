"""Event-sequence analytics: first-order transitions (user flow) and
strictly ordered funnels with a conversion window.

q60's session funnel counts step PRESENCE inside a session; the two
operators here are the order-aware complements every product-
analytics warehouse ships:

- ``transition_matrix`` — "where do users go next": per-key event
  streams pair each event with its successor (one ``lead()`` window),
  and (from, to) counts normalize to probabilities. The Markov-chain
  view of the event log; top destinations per source, loop detection,
  and flow sankeys all read straight off it.
- ``ordered_funnel`` — "how many users did A then B then C, in that
  order, within T": each step's timestamp is the EARLIEST occurrence
  strictly after the previous step's (the standard strict-funnel
  semantics — re-orderings and pre-existing later steps don't count),
  with an optional overall conversion window from step 1.

Determinism: ordering is total via (ts, tiebreak); probabilities ride
as integer micro-units (round at the end of exact BIGINT count
ratios); the funnel emits exact user counts.

Scale shape: both are one shuffle on the key. The transition pairing
is a single lead() window; the funnel is k chained min-over windows
across the SAME partitioning (Catalyst plans one exchange, k Window
nodes) — never a self-join per step, never a row explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(from_state, to_state, n, prob_micro): successor counts over
    per-key event order and row-normalized probabilities. Terminal
    events (a key's last) have no successor and contribute to no row;
    Σ prob over a from_state is 1e6 ± rounding."""
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(F.col(state_col)).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = pairs.groupBy("from_state").agg(F.sum("n").alias("__tot"))
    return (
        pairs.join(F.broadcast(totals), "from_state")
        .select(
            "from_state",
            "to_state",
            "n",
            F.round(F.col("n") / F.col("__tot") * 1_000_000).cast("long").alias("prob_micro"),
        )
    )


def ordered_funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """One row per funnel step: (step_index, step, n_keys) where
    ``n_keys`` counts keys whose EARLIEST strictly-ordered chain
    reaches that step — step i's timestamp is the minimum occurrence
    strictly after step i-1's — and, when ``within_seconds`` is set,
    whose step-i timestamp falls within that window of step 1.

    Strict-order semantics: a purchase BEFORE the first view does not
    complete view→purchase; a re-view after the purchase doesn't
    either. Greedy-earliest chaining is the standard funnel rule;
    without a window it maximizes completion (any valid chain implies
    the greedy one). WITH a window the greedy chain is still what gets
    measured — a user whose earliest chain overruns the window is not
    re-tried from a later step-1 (the common product-analytics
    convention; restart-per-anchor is a different, costlier operator).

    Timestamps may be TIMESTAMP/TIMESTAMP_NTZ or numeric epoch
    seconds; the window arithmetic runs on epoch seconds either way.
    """
    if not steps:
        raise ValueError("ordered_funnel: steps must be non-empty")
    from pyspark.sql import Window

    dt = dict(df.dtypes)[ts_col]
    if dt == "timestamp_ntz":
        secs = F.expr(
            f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        )
    elif dt == "timestamp":
        secs = F.unix_timestamp(F.col(ts_col))
    else:
        secs = F.col(ts_col).cast("long")
    w = Window.partitionBy("__k")
    work = df.select(F.col(key_col).alias("__k"), F.col(state_col).alias("__e"), secs.alias("__s"))
    prev = None
    for i, step in enumerate(steps):
        cond = F.col("__e") == step
        if prev is not None:
            cond = cond & F.col(prev).isNotNull() & (F.col("__s") > F.col(prev))
        col = f"__t{i}"
        work = work.withColumn(col, F.min(F.when(cond, F.col("__s"))).over(w))
        prev = col
    per_key = work.groupBy("__k").agg(
        *[F.min(f"__t{i}").alias(f"t{i}") for i in range(len(steps))]
    )
    rows = []
    for i, step in enumerate(steps):
        reached = F.col(f"t{i}").isNotNull()
        if within_seconds is not None and i > 0:
            reached = reached & (F.col(f"t{i}") - F.col("t0") <= int(within_seconds))
        rows.append(
            per_key.agg(
                F.lit(i + 1).cast("int").alias("step_index"),
                F.lit(step).alias("step"),
                F.sum(F.when(reached, 1).otherwise(0)).cast("long").alias("n_keys"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def _ts_to_secs(df: DataFrame, ts_col: str) -> F.Column:
    """Epoch-seconds column for TIMESTAMP / TIMESTAMP_NTZ / numeric
    (shared by both funnel variants)."""
    dt = dict(df.dtypes)[ts_col]
    if dt == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        )
    if dt == "timestamp":
        return F.unix_timestamp(F.col(ts_col))
    return F.col(ts_col).cast("long")


def ordered_funnel_restart(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    steps: list[str],
    within_seconds: int,
) -> DataFrame:
    """Restart-per-anchor strict funnel: one row per step —
    (step_index, step, n_keys) where ``n_keys`` counts keys for which
    ANY step-1 occurrence (anchor) starts a strictly-increasing greedy
    chain that reaches the step within ``within_seconds`` of that
    anchor.

    This is the other standard funnel convention (``ordered_funnel``
    documents the single-chain one): a user whose earliest chain
    overruns the window is RE-TRIED from every later anchor, so a
    Monday visit that went nowhere doesn't disqualify Friday's
    conversion. Greedy-from-each-anchor is exhaustive: if any valid
    chain exists from an anchor, the greedy chain from it is valid too
    (each greedy step takes the earliest candidate, which can only
    leave more room for later steps), so per anchor only the greedy
    chain needs testing — never a combinatorial search.

    Plan shape: ONE shuffle — per-key sorted timestamp arrays per step
    (k array-aggregates over the same groupBy), then the whole
    anchor × chain evaluation is nested higher-order array functions
    (filter / array_min) inside whole-stage codegen: no second
    shuffle, no per-anchor join, no Python. Per-key cost is
    O(anchors · Σ_j |step_j events|) array scanning inside one task —
    the same events-per-key bound every sessionizer carries; the
    window bound keeps real chains short.

    ``within_seconds`` is REQUIRED here (restart semantics without a
    window collapse to ``ordered_funnel``: greedy-from-first-anchor is
    then already exhaustive).
    """
    if not steps:
        raise ValueError("ordered_funnel_restart: steps must be non-empty")
    if within_seconds is None or int(within_seconds) <= 0:
        raise ValueError(
            "ordered_funnel_restart: within_seconds must be a positive int "
            f"(got {within_seconds!r}); use ordered_funnel for the unwindowed form"
        )
    secs = _ts_to_secs(df, ts_col)
    work = df.select(
        F.col(key_col).alias("__k"),
        F.col(state_col).alias("__e"),
        secs.alias("__s"),
    )
    per_key = work.groupBy("__k").agg(
        *[
            F.array_sort(
                F.collect_list(F.when(F.col("__e") == s, F.col("__s")))
            ).alias(f"__a{i}")
            for i, s in enumerate(steps)
        ]
    )
    W = int(within_seconds)
    # chain expression from anchor variable `a`: c_0 = a,
    # c_j = array_min(filter(__a_j, x_j -> x_j > c_{j-1}))
    chains = ["a"]
    for j in range(1, len(steps)):
        chains.append(
            f"array_min(filter(__a{j}, x{j} -> x{j} > ({chains[j - 1]})))"
        )
    rows = []
    for i, step in enumerate(steps):
        if i == 0:
            reached = F.size(F.col("__a0")) > 0
        else:
            # exists an anchor whose greedy chain reaches step i in window
            pred = f"({chains[i]}) IS NOT NULL AND ({chains[i]}) - a <= {W}"
            reached = F.expr(f"size(filter(__a0, a -> {pred})) > 0")
        rows.append(
            per_key.agg(
                F.lit(i + 1).cast("int").alias("step_index"),
                F.lit(step).alias("step"),
                F.sum(F.when(reached, 1).otherwise(0)).cast("long").alias("n_keys"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def follows_within(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Sequential-pattern support: for every ordered pair of distinct
    states (a → b), how many keys saw their FIRST ``b`` within
    ``gap_seconds`` AFTER their first ``a`` — the "what do users do
    next" miner behind onboarding and journey analysis. Output:
    ``(state_a, state_b, n_keys, support_micro)`` with support =
    n_keys·10⁶ div total keys observed, rows only for pairs some key
    exhibited.

    First-occurrence semantics make this scale-safe BY CONSTRUCTION:
    the input collapses to one row per (key, state) — a min()
    aggregate — before any pairing, so the per-key self-join fans out
    at most |states|² candidates per key, a CONSTANT for real state
    alphabets (the q142/q150 bounded-fan-out contract), never the
    events-per-key quadratic of a raw event self-join. Plan: one
    groupBy(key, state), one key-equi self-join of that collapsed
    table, one pair-level count.

    Determinism: timestamps compare as integer epoch seconds; counts
    are exact; the single division is integer micro-units.
    """
    if gap_seconds < 1:
        raise ValueError(f"follows_within: gap_seconds must be >= 1, got {gap_seconds}")
    d = df.where(
        F.col(key_col).isNotNull() & F.col(state_col).isNotNull()
    ).select(
        F.col(key_col).alias("__k"),
        F.col(state_col).alias("__s"),
        _ts_to_secs(df, ts_col).alias("__t"),
    )
    firsts = d.groupBy("__k", "__s").agg(F.min("__t").alias("__t0"))
    total = firsts.select("__k").distinct().count()
    a = firsts.select(
        F.col("__k"), F.col("__s").alias("state_a"), F.col("__t0").alias("__ta")
    )
    b = firsts.select(
        F.col("__k").alias("__kb"),
        F.col("__s").alias("state_b"),
        F.col("__t0").alias("__tb"),
    )
    pairs = (
        a.join(b, a.__k == b.__kb)
        .where(
            (F.col("state_a") != F.col("state_b"))
            & (F.col("__tb") > F.col("__ta"))
            & (F.col("__tb") - F.col("__ta") <= F.lit(int(gap_seconds)))
        )
        .groupBy("state_a", "state_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    )
    return pairs.select(
        "state_a",
        "state_b",
        "n_keys",
        F.expr(f"n_keys * 1000000 div {max(total, 1)}").alias("support_micro"),
    )


def top_paths(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    state_col: str,
    depth: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """Most common length-``depth`` event paths across all keys:
    ``(path, n, rk)`` with ``path`` = '>'-joined consecutive states
    per key in (ts, order_col) order, counted over every sliding
    position, top ``top_k`` by count with ties broken on the path
    string. The "what journeys dominate" readout behind sankey/flow
    charts.

    Scale shape: ``depth−1`` lead() columns over ONE (key-partitioned,
    time-ordered) window — constant per-row fan-out, no self-join, no
    per-key explosion regardless of how long a key's history is — then
    one count per distinct path and a TakeOrderedAndProject-sized
    top-k. ``order_col`` makes same-timestamp ordering total
    (determinism would otherwise be partition luck).
    """
    from pyspark.sql import Window

    if depth < 2:
        raise ValueError(f"top_paths: depth must be >= 2, got {depth}")
    if top_k < 1:
        raise ValueError(f"top_paths: top_k must be >= 1, got {top_k}")
    d = df.where(
        F.col(key_col).isNotNull() & F.col(state_col).isNotNull()
    ).select(
        F.col(key_col).alias("__k"),
        _ts_to_secs(df, ts_col).alias("__t"),
        F.col(order_col).alias("__o"),
        F.col(state_col).alias("__s"),
    )
    w = Window.partitionBy("__k").orderBy("__t", "__o")
    steps = [F.col("__s")] + [
        F.lead("__s", i).over(w) for i in range(1, depth)
    ]
    paths = d.select(F.concat_ws(">", *steps).alias("path"), *[
        s.alias(f"__s{i}") for i, s in enumerate(steps)
    ])
    complete = paths.where(
        F.lit(True) & F.col(f"__s{depth-1}").isNotNull()
    )
    counts = complete.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w_rk = Window.orderBy(F.col("n").desc(), F.col("path").asc())
    return (
        counts.withColumn("rk", F.row_number().over(w_rk).cast("long"))
        .where(F.col("rk") <= top_k)
    )


def seq_rules(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Sequential association rules: ``follows_within`` support plus
    rule CONFIDENCE — for each ordered pair (a → b),
    ``confidence_micro`` = keys that did a→b within the gap ·10⁶ div
    keys whose history contains a at all. The "given they did A, how
    likely is B next" readout that turns journey counts into
    recommendations.

    Same bounded-by-construction shape as ``follows_within`` (one
    (key, state) first-occurrence collapse, |states|² max fan-out per
    key); the antecedent counts are one extra map-side-combined
    aggregate of the collapsed table, broadcast back onto the
    |states|²-sized rule list.
    """
    if gap_seconds < 1:
        raise ValueError(f"seq_rules: gap_seconds must be >= 1, got {gap_seconds}")
    d = df.where(
        F.col(key_col).isNotNull() & F.col(state_col).isNotNull()
    ).select(
        F.col(key_col).alias("__k"),
        F.col(state_col).alias("__s"),
        _ts_to_secs(df, ts_col).alias("__t"),
    )
    firsts = d.groupBy("__k", "__s").agg(F.min("__t").alias("__t0"))
    total = firsts.select("__k").distinct().count()
    n_a = firsts.groupBy(F.col("__s").alias("state_a")).agg(
        F.count(F.lit(1)).cast("long").alias("__na")
    )
    a = firsts.select(
        F.col("__k"), F.col("__s").alias("state_a"), F.col("__t0").alias("__ta")
    )
    b = firsts.select(
        F.col("__k").alias("__kb"),
        F.col("__s").alias("state_b"),
        F.col("__t0").alias("__tb"),
    )
    pairs = (
        a.join(b, a.__k == b.__kb)
        .where(
            (F.col("state_a") != F.col("state_b"))
            & (F.col("__tb") > F.col("__ta"))
            & (F.col("__tb") - F.col("__ta") <= F.lit(int(gap_seconds)))
        )
        .groupBy("state_a", "state_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    )
    return pairs.join(F.broadcast(n_a), "state_a").select(
        "state_a",
        "state_b",
        "n_keys",
        F.expr(f"n_keys * 1000000 div {max(total, 1)}").alias("support_micro"),
        F.expr("n_keys * 1000000 div __na").alias("confidence_micro"),
    )
