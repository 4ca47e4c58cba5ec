"""Change-data-capture apply: reduce an ordered change feed to the
final table state, honoring deletes.

The batch-engine analog of Delta Lake's ``APPLY CHANGES INTO`` / a SQL
``MERGE`` with ``WHEN MATCHED AND op = 'delete' THEN DELETE``: for each
key, the change with the highest sequence wins; if that winning change
is a delete, the key is absent from the result. This extends
``latest.latest_per_key`` (which can only keep) with delete semantics —
the missing piece for replaying an upstream database's CDC stream into
a lake table.

Scale: one shuffle on the key, and the window plans as
WindowGroupLimit (map-side partial top-1 before the exchange) exactly
like latest_per_key — the filter on rn == 1 is pushed into the sort.
For a continuous feed, compose with ``streaming`` (dropDuplicates
within watermark, then this as the batch compactor per micro-batch
output) — the apply itself is idempotent: re-running over old + new
changes yields the same state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    changes: DataFrame,
    keys: list[str],
    sequence_cols: list[str],
    op_col: str,
    delete_ops: Sequence[str] = ("delete",),
) -> DataFrame:
    """Apply a CDC feed: latest change per key wins; deletes remove.

    ``sequence_cols`` must be a deterministic total order per key
    (e.g. ``["ts", "event_id"]`` — include a unique id to break
    timestamp ties, or replays would be nondeterministic).
    """
    order = [F.col(c).desc() for c in sequence_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(~F.col(op_col).isin(list(delete_ops)))
        .drop("__rn")
    )
