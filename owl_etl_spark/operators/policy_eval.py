"""Offline policy evaluation from logged interaction data: IPS and
SNIPS estimators — the counterfactual "what would this other policy
have earned" readout used before any online test (recommender swaps,
prompt-routing policies, data-mixture controllers).

Given logs (context, action, reward) and a candidate policy, inverse-
propensity scoring reweights the logged rewards of the rows where the
candidate agrees with the log:

    IPS   = (1/N) Σ 1{a_i = π(x_i)} · r_i / p̂(a_i | x_i)
    SNIPS = Σ 1{·} r_i/p̂  ÷  Σ 1{·} 1/p̂        (self-normalized)

with the propensity p̂(a|x) = n_ax/n_x estimated from the logs (the
standard plug-in when the logger's probabilities weren't recorded —
documented, not hidden). This operator scores EVERY fixed-action
policy "always play a" side by side — the honest family to evaluate
offline, because for a deterministic policy the two estimators only
separate through CONTEXT COVERAGE: in a context that never logged
action a, IPS silently contributes 0 (it divides by the full N) while
SNIPS renormalizes by the matched mass only. Reporting both plus the
coverage makes the gap — the thing IPS papers warn about — visible in
the output instead of buried.

Integer discipline (oracle-replayable): rewards arrive as exact
integers (cents); each (context, action) group contributes
fd(r_sum · n_x, n_ax) to the numerator — one exact-multiple floor
division per GROUP, never per row — and the matched Σ1/p̂ telescopes
to Σ n_x over covered contexts EXACTLY, so both denominators are
plain BIGINT sums. Overflow: r_sum·n_x ≤ total_cents·max_context_rows
(raise awareness past ~10¹⁴ total cents).

Scale shape: ONE groupBy (context, action) carries counts and matched
reward sums; context totals ride a window over that aggregate (group-
sized, not data-sized). No second pass, no per-row division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _fd(x: str, d: str) -> str:
    """Exact-multiple floor division (Spark div == DuckDB //)."""
    return f"(({x}) - (((({x}) % ({d})) + ({d})) % ({d}))) div ({d})"


def ips_policy_value(
    logs: DataFrame,
    context_col: str,
    action_col: str,
    reward_col: str,
) -> DataFrame:
    """IPS and SNIPS value of every fixed-action policy. One row per
    action: ``(action, n, n_matched, contexts_covered, contexts_total,
    ips_micro, snips_micro)`` — micro reward units, exact BIGINTs.

        ips_num(a)   = Σ_{x: n_ax>0} fd(r_sum_ax · n_x, n_ax)
        ips_micro    = fd(ips_num · 1e6, N)
        snips_micro  = fd(ips_num · 1e6, Σ_{x: n_ax>0} n_x)

    The coverage columns expose WHY the two differ; an action logged
    in every context has ips_micro == snips_micro by construction."""
    from pyspark.sql import Window

    d = logs.select(
        F.col(context_col).cast("string").alias("__x"),
        F.col(action_col).cast("string").alias("__a"),
        F.col(reward_col).cast("long").alias("__r"),
    ).filter(
        F.col("__x").isNotNull() & F.col("__a").isNotNull() & F.col("__r").isNotNull()
    )
    ga = d.groupBy("__x", "__a").agg(
        F.count(F.lit(1)).cast("long").alias("__nax"),
        F.sum("__r").cast("long").alias("__rsum"),
    )
    g = ga.withColumn(
        "__nx", F.sum("__nax").over(Window.partitionBy("__x")).cast("long")
    )
    totals = g.agg(
        F.sum("__nax").cast("long").alias("__N"),
        F.count_distinct("__x").cast("long").alias("__CX"),
    )
    per_action = g.groupBy("__a").agg(
        F.sum("__nax").cast("long").alias("n_matched"),
        F.count(F.lit(1)).cast("long").alias("contexts_covered"),
        F.sum(F.expr(_fd("__rsum * __nx", "__nax"))).cast("long").alias("__num"),
        F.sum("__nx").cast("long").alias("__covmass"),
    )
    return (
        per_action.crossJoin(F.broadcast(totals))
        .select(
            F.col("__a").alias("action"),
            F.col("__N").alias("n"),
            "n_matched",
            "contexts_covered",
            F.col("__CX").alias("contexts_total"),
            F.expr(_fd("__num * 1000000", "__N")).cast("long").alias("ips_micro"),
            F.expr(_fd("__num * 1000000", "__covmass"))
            .cast("long")
            .alias("snips_micro"),
        )
        .orderBy("action")
    )
