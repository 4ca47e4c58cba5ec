"""Rolling order statistics: exact trailing-window median / quartiles
per key.

The robust cousin of the rolling mean/Bollinger family
(resample.py): a single spiked reading drags a trailing mean for the
whole window, while the rolling median shrugs it off — the form
monitoring dashboards actually want for latency/price series. Means
have algebraic partial aggregates; order statistics don't, so the
exact small-window form materializes each row's trailing window as a
sorted array (collect_list over a ROWS frame, bounded by
``window_rows``) and reads the ranks straight out of it.

Determinism: values are integer units; p25/median-halves/p75 are
nearest-rank ORDER STATISTICS of the sorted window (pure indexing,
no interpolation except the even-count median, whose half-sum
(a+b)/2.0 is a division by a power of two — exact in binary, so both
engines emit the identical double).

Scale shape: ONE shuffle on the keys, one window pass; per-row state
is the O(window_rows) array — memory is rows·window, which is why
``window_rows`` is capped (a 10⁶-row window belongs to the sketch
family, not this operator; it raises here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: beyond this, per-row array state stops being "small constant"
MAX_WINDOW_ROWS = 4096


def rolling_median_report(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    window_rows: int = 25,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Attach ``n_window`` (rows actually present — series heads have
    fewer), ``p25`` / ``p75`` (nearest-rank order statistics, exact
    longs), and ``rolling_median`` (even-count windows average the two
    central ranks — an exact double) over the trailing
    ``window_rows`` rows per key in (order, tiebreak) order. Null
    values are excluded from the window (they carry no rank)."""
    if not (1 <= int(window_rows) <= MAX_WINDOW_ROWS):
        raise ValueError(
            f"rolling_median_report: window_rows must be in "
            f"[1, {MAX_WINDOW_ROWS}], got {window_rows}"
        )
    from pyspark.sql import Window

    order = [F.col(order_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(-(int(window_rows) - 1), Window.currentRow)
    )
    v = F.col(value_col).cast("long")
    arr = F.sort_array(F.collect_list(v).over(w))
    staged = df.withColumn("__arr", arr).withColumn("__nw", F.size("__arr"))
    lo = F.element_at("__arr", F.expr("(__nw + 1) div 2").cast("int"))
    hi = F.element_at("__arr", F.expr("__nw div 2 + 1").cast("int"))
    p25 = F.element_at("__arr", F.expr("(__nw + 3) div 4").cast("int"))
    p75 = F.element_at("__arr", F.expr("(3 * __nw + 3) div 4").cast("int"))
    return (
        staged.withColumn(
            "rolling_median",
            F.when(F.col("__nw") > 0, (lo + hi) / F.lit(2.0)),
        )
        .withColumn("p25", F.when(F.col("__nw") > 0, p25))
        .withColumn("p75", F.when(F.col("__nw") > 0, p75))
        .withColumn("n_window", F.col("__nw").cast("long"))
        .drop("__arr", "__nw")
    )


def clamped_running_balance(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    delta_col: str,
    tiebreak_col: str | None = None,
    floor: int = 0,
) -> DataFrame:
    """Running balance per key with a hard floor — the
    inventory/prepaid-wallet recurrence b_t = max(floor, b_{t−1} + d_t)
    (withdrawals can't take the balance below the floor; the deficit
    is forfeited, not carried). The recurrence looks inherently
    sequential, but has an exact one-pass closed form:

        b_t = floor + S_t − min(0, min_{j<=t} S_j)

    (S = running sum of deltas, both shifted by −floor) — so the
    operator is ONE window pass (running sum + running min on the
    same keyed sort), no iteration, no UDF, no state. All arithmetic
    is exact BIGINT; the result is deterministic for any
    partitioning because (order_col, tiebreak_col) must order rows
    totally within a key (same contract as every windowed operator
    here).

    Returns the input key/order/delta columns plus ``balance``. Null
    deltas raise (a silent 0 would hide upstream corruption) via a
    guard woven into the balance column.
    """
    from pyspark.sql import Window

    order = [F.col(order_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    d = F.col(delta_col).cast("long")
    guarded = F.when(
        d.isNull(),
        F.raise_error(
            F.lit("clamped_running_balance: null delta — fill or filter upstream")
        ).cast("long"),
    ).otherwise(d)
    cols = [*keys, F.col(order_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col is not None else []
    )
    staged = df.select(*cols, d.alias("delta"), F.sum(guarded).over(w).alias("__run"))
    runmin = F.min("__run").over(w)
    return staged.select(
        *[c for c in staged.columns if c != "__run"],
        (F.lit(int(floor)) + F.col("__run") - F.least(F.lit(0).cast("long"), runmin))
        .cast("long")
        .alias("balance"),
    )


def max_drawdown_report(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    delta_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key maximum drawdown of the running balance — the risk
    readout behind "how far under water did this account/strategy/
    inventory get from its best point": with S_t the running sum of
    deltas, drawdown_t = max_{j≤t} S_j − S_t, and the report gives
    its maximum along with the peak and final levels.

    Like ``clamped_running_balance``, the 'peak so far' recurrence is
    a window closed form, not a loop: ONE window pass (running sum +
    running max over the same keyed (order, tiebreak) total-order
    sort) followed by a per-key aggregate ON THE SAME KEYS — Catalyst
    plans a single shuffle. All arithmetic is exact BIGINT; null
    deltas raise (woven), the sibling contract.

    Returns ``(*keys, n, final_balance, peak_balance, max_drawdown)``
    — max_drawdown ≥ 0, 0 for monotone-rising series.
    """
    from pyspark.sql import Window

    d0 = F.col(delta_col).cast("long")
    d = F.when(
        d0.isNull(),
        F.raise_error(
            F.lit(
                f"max_drawdown_report: {delta_col} is NULL — filter or impute "
                "deltas first (a silent 0 would hide upstream corruption)"
            )
        ).cast("long"),
    ).otherwise(d0)
    order = [F.col(order_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum("__d").over(w)
    staged = (
        df.select(*keys, F.col(order_col), *( [F.col(tiebreak_col)] if tiebreak_col else [] ), d.alias("__d"))
        .withColumn("__s", run)
        .withColumn("__peak", F.max("__s").over(w))
    )
    return staged.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        # final = Σ deltas (order-independent), peak = max running sum,
        # drawdown = max(peak_so_far − S) — all exact BIGINT
        F.sum("__d").cast("long").alias("final_balance"),
        F.max("__s").cast("long").alias("peak_balance"),
        F.max(F.col("__peak") - F.col("__s")).cast("long").alias("max_drawdown"),
    )


def next_greater_steps(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    max_look: int = 10,
) -> DataFrame:
    """Per row, the number of steps until the next STRICTLY GREATER
    value in the key's sequence, looking at most ``max_look`` rows
    ahead — the stock-span / days-to-better-price primitive ("how
    long until this price is beaten"), and the monotone-stack
    interview classic recast as a window expression.

    The unbounded version needs a future scan (a per-row subquery —
    quadratic); the BOUNDED form is exactly ``max_look`` lead()
    columns over ONE keyed sort: steps = least over j ∈ 1..max_look
    of (lead(value, j) > value ? j : null), null when nothing greater
    appears within the horizon (indistinguishable from "series ended"
    — by design, both mean 'not beaten within the declared window').
    Catalyst evaluates all leads in a single Window pass, so the cost
    is one shuffle + one sort regardless of max_look.

    All comparisons are exact BIGINT. Returns the input key/order
    columns plus ``value`` and ``steps_to_greater``.
    """
    if not 1 <= int(max_look) <= 100:
        raise ValueError(
            f"next_greater_steps: max_look must be in [1, 100], got {max_look}"
        )
    from pyspark.sql import Window

    v = F.col(value_col).cast("long")
    order = [F.col(order_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    base = df.select(
        *keys,
        F.col(order_col),
        *([F.col(tiebreak_col)] if tiebreak_col else []),
        v.alias("__v"),
    )
    candidates = [
        F.when(F.lead("__v", j).over(w) > F.col("__v"), F.lit(j).cast("long"))
        for j in range(1, int(max_look) + 1)
    ]
    steps = F.least(*candidates) if len(candidates) > 1 else candidates[0]
    return base.withColumn("steps_to_greater", steps).withColumnRenamed(
        "__v", "value"
    )
