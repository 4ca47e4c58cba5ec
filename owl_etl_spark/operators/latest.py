"""Latest-version-per-key dedup and upsert-by-recency (SURVEY.md W1/F4/S10).

The reference keeps only the most recent fact sheet per fund
(``(nombre_fic, url)`` key, ``fecha_corte`` recency; older incoming
versions dropped — src/etl/load.py:99-219). The canonical distributed
form is a single window dedup; the "upsert" against an existing gold
table is an anti-join + union + the same window — no driver loops, no
per-row lookups.

Scale notes: the window shuffles once on the key — same cost as the
groupBy a MERGE would need. For skewed keys AQE skew-join handles the
union-side; the window itself partitions by key so a pathological
single hot key would need salting + a two-level max (not needed for
fund-sized keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    recency_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keep the most recent row per key (W1).

    ``recency_col`` compares with plain column ordering — for the
    reference's ISO-string dates that is the same lexicographic
    comparison it performs (src/etl/load.py:107). Nulls sort last
    (a null recency never wins over a dated row, matching F4's
    null-date carve-out as closely as batch semantics allow).
    ``tiebreak`` makes the result deterministic when recencies tie.
    """
    order = [F.col(recency_col).desc_nulls_last()] + [
        F.col(c).desc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_by_recency(
    existing: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    recency_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Merge incoming rows into an existing snapshot, newest-per-key wins
    (S10/F4 as a batch operator).

    Equivalent to a Delta ``MERGE ... WHEN MATCHED AND s.recency >
    t.recency THEN UPDATE WHEN NOT MATCHED THEN INSERT``, expressed
    engine-agnostically as union + window dedup. Ties favor the
    existing row (incoming equal-or-older is discarded,
    src/etl/load.py:213-216).
    """
    tagged_existing = existing.withColumn("__src", F.lit(0))
    tagged_incoming = incoming.withColumn("__src", F.lit(1))
    unioned = tagged_existing.unionByName(tagged_incoming, allowMissingColumns=True)
    # Order: newer recency first; on exact tie prefer existing (__src asc).
    order = [F.col(recency_col).desc_nulls_last(), F.col("__src").asc()] + [
        F.col(c).desc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
