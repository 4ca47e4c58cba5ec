"""Slowly-changing-dimension (Type 2) builder: change events →
validity intervals.

The warehouse-core operation downstream of CDC (cdc.py applies the
LATEST state; this keeps ALL of history): from a stream of observed
states per key, produce one row per VERSION — consecutive duplicate
observations collapse (observing the same value again is not a new
version), each version carries [valid_from, valid_to) with an open
(null) end and ``is_current`` on the latest. An as-of join against
the result (asof.py) answers "what was the value at time t" — the
classic SCD2 + point-in-time lookup pair.

Determinism: ordering is total via (ts, tiebreak); change detection
is null-safe per tracked column (NULL→value and value→NULL are real
transitions; NULL→NULL is not). Plan: ONE shuffle on the keys — the
change-flag lag() window and the valid_to lead() window share the
same partitioning, so Catalyst plans one exchange with two Window
nodes; no self-joins, no row explosion (output ≤ input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_build(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One row per (key, version): ``(keys..., value_cols...,
    valid_from, valid_to, is_current)`` — ``valid_from`` the first
    observation of the version's state, ``valid_to`` the next
    version's start (null while current), versions defined by
    null-safe change in ANY of ``value_cols`` under the (ts,
    tiebreak) total order."""
    if not value_cols:
        raise ValueError("scd2_build: value_cols must be non-empty")
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.lit(False)
    for c in value_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    # a key's first observation is always a version (lag is null ->
    # eqNullSafe false -> changed true unless the value is ALSO null;
    # the explicit first-row test keeps all-null first states too)
    first = F.lag(F.col(ts_col)).over(w).isNull()
    versions = df.withColumn("__new", changed | first).filter(F.col("__new"))
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return versions.select(
        *keys,
        *value_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
        F.lead(F.col(ts_col)).over(w2).isNull().alias("is_current"),
    )
