"""Privacy gates: k-anonymity measurement and suppression.

Complement of the PII redaction surface (functions/text.py, q61):
redaction scrubs direct identifiers; k-anonymity bounds RE-identification
through QUASI-identifiers — combinations like (nation, segment,
birth-year) that are individually harmless but jointly unique. A
release is k-anonymous when every quasi-identifier combination is
shared by ≥ k rows; the standard pipeline gate before publishing a
training extract or analytics cut.

Both operators are one exact groupBy on the quasi columns (map-side
combined — the group count is bounded by the quasi-value cross
product, not the data) plus, for suppression, one broadcast-able
semi-join of the at-risk combinations back onto the rows. No
approximation: an UNDER-counted group size would leak rows, so unlike
the sketch family this gate must stay exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(df: DataFrame, quasi_cols: list[str], k: int = 5) -> DataFrame:
    """One row per quasi-identifier combination: ``n`` (exact member
    count, nulls grouped as their own value — a null combo is just as
    linkable) and ``at_risk`` (n < k)."""
    if k < 2:
        raise ValueError(f"k_anonymity_report: need k >= 2, got {k}")
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).withColumn("at_risk", F.col("n") < k)


def k_anonymity_suppress(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """The suppression release: rows whose quasi-combination has ≥ k
    members (the minimal-distortion baseline — generalization ladders
    trade less data loss for more machinery and sit above this).
    Plans as an aggregate + join on the quasi key; at 100 TB the
    at-risk combo list is usually tiny and broadcasts."""
    safe = (
        k_anonymity_report(df, quasi_cols, k)
        .filter(~F.col("at_risk"))
        .select(*quasi_cols)
    )
    # null-SAFE equality: a name-list join drops null quasi values
    # (null != null), silently suppressing combos the report counted
    # as safe — the exact asymmetry a privacy gate must not have
    cond = None
    for c in quasi_cols:
        term = df[c].eqNullSafe(safe[c])
        cond = term if cond is None else cond & term
    return df.join(safe, cond, "left_semi")
