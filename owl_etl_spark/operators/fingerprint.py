"""Order-independent table content fingerprints — the reconciliation
primitive for data movement: after a migration / backfill / CDC
replay, "are these two tables the same?" must not cost a sort-merge
diff of everything. A COMMUTATIVE hash over row digests gives a
constant-size certificate:

    row_digest  = md5_long( canonical serialization of the row )
    content_sum = Σ row_digests  mod  (2⁶¹ − 1)

Addition is commutative and associative, so the fingerprint is
independent of partitioning, row order, and merge tree shape —
per-partition partial sums combine map-side, a billion-row table
costs one scan and ships eight bytes. Two tables with equal
(n_rows, content_sum) match with overwhelming probability; DIFFERING
fingerprints are a proof of difference (the one-sided guarantee is
the honest statement — a 61-bit commutative sum is a checksum, not a
cryptographic commitment: an adversary could craft collisions,
drift cannot).

Canonical serialization: each column cast to string with an explicit
NULL sentinel and a field separator that cannot appear in the cast
output of numeric/date types; caller-supplied column order is part
of the contract. md5-portable, so the oracle replays the whole
fingerprint in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from owl_etl_spark.functions.hashing import md5_long

#: Mersenne prime 2^61-1: sums of 60-bit digests never overflow
#: BIGINT before the mod, and the modulus is engine-portable.
_FP_MOD = 2**61 - 1


def table_fingerprint(
    df: DataFrame,
    cols: list[str],
    label: str,
) -> DataFrame:
    """One-row fingerprint ``(table, n_rows, content_sum)`` over the
    given column order (see module docstring). Rows digest as
    md5(col₁ ‖ '|' ‖ col₂ …) with NULLs as the sentinel '␀'."""
    if not cols:
        raise ValueError("table_fingerprint: no columns given")
    ser = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("␀")) for c in cols]
    )
    # digests sum as DECIMAL(38,0) (61-bit values overflow BIGINT
    # after 3 rows; decimal38 holds ~10¹⁸ rows of headroom), one mod
    # at the end — all positive, so % == pmod on both engines
    return df.select(md5_long(ser).alias("__h")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr(
            f"cast(sum(cast(pmod(__h, {_FP_MOD}) as decimal(38, 0)))"
            f" % {_FP_MOD} as bigint)"
        ).alias("content_sum"),
    ).select(F.lit(label).alias("table"), "n_rows", "content_sum")
