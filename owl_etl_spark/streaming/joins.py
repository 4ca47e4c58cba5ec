"""Stream-stream joins and custom stateful sessionization.

The reference has no streaming runtime (SURVEY.md §2.10); these extend
the engine's streaming surface with the two remaining building blocks a
continuous pipeline needs:

- ``stream_stream_interval_join``: watermarked event-time interval join
  (e.g. attribute a purchase to the click that preceded it within an
  attribution window). Both sides are unbounded; Spark buffers each
  side's state only up to watermark + interval bound, so state is
  bounded and sharded by the join key across the cluster — this is the
  100 TB-safe formulation (an unbounded un-watermarked join would grow
  state forever).
- ``sessionize_stateful``: gap-based sessions via
  ``applyInPandasWithState`` with an EVENT-TIME timeout. Unlike the
  native ``session_window`` aggregation (streaming/windows.py), this
  emits one row per *closed* session exactly when the watermark passes
  ``last_event + gap``, and state for quiet keys is evicted by the same
  timeout — demonstrating timer-driven eviction, which the native
  operator hides.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    max_lag: str = "30 minutes",
) -> DataFrame:
    """Join right-side events to left-side events on ``key`` where the
    right event happens within ``(left_ts, left_ts + max_lag]``.

    Both inputs must be streaming DataFrames with event-time columns
    ``left_ts`` / ``right_ts``. The interval condition plus the two
    watermarks let Spark compute a state-eviction bound for each side
    (left rows are dropped once right's watermark passes
    ``left_ts + max_lag``; right rows once left's watermark passes
    ``right_ts``).
    """
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] > lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_lag}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])


# Output: one row per closed session. Boundaries are EPOCH MILLISECOND
# longs, not timestamps: pandas receives session-LOCAL naive walls for
# timestamp columns, so ms derived from them would shift with the
# session TZ — and event-time TIMERS compare against the engine
# watermark, which is instant-based, making local-wall timers fire
# offset-hours early or late (found via the q126 hostile-TZ gate:
# UTC/Kathmandu sessions near the stream tail stayed open while Bogota
# flushed everything). Instants in, instants out; render at the edge.
_SESSION_OUT = (
    "user_id bigint, session_start_ms bigint, session_end_ms bigint, n_events bigint"
)
# State: session under construction for this key.
_SESSION_STATE = "start_ms bigint, last_ms bigint, n bigint"


def sessionize_stateful(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Emit ``(user_id, session_start_ms, session_end_ms, n_events)``
    for each session closed by a ``gap_seconds`` quiet period, detected
    by event-time timeout. Boundaries are true epoch-millisecond
    instants, timezone-independent (see ``_SESSION_OUT``).

    A session closes when (a) the watermark passes ``last_event + gap``
    with no new event (timer fires → emit + state removed), or (b) a
    new event for the key arrives more than ``gap`` after the previous
    one (emit the old session, start a new one). Per-key state is three
    scalars; quiet keys are evicted by their timers, so total state is
    O(active keys), not O(all keys ever seen).
    """
    gap_ms = gap_seconds * 1000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(start_ms: int, last_ms: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_ms": [start_ms],
                    "session_end_ms": [last_ms],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield emit(start_ms, last_ms, n)
            return

        start_ms, last_ms, n = state.get if state.exists else (None, None, 0)
        closed = []
        # __us carries unix_micros(ts): the true instant, unaffected by
        # the session-local rendering pandas gets for timestamp columns
        ts_values = sorted(
            int(v) // 1000
            for pdf in pdfs
            for v in pdf["__us"].astype("int64").tolist()
        )
        for t in ts_values:
            if last_ms is None:
                start_ms, last_ms, n = t, t, 1
            elif t - last_ms > gap_ms:
                closed.append((start_ms, last_ms, n))
                start_ms, last_ms, n = t, t, 1
            else:
                last_ms, n = max(last_ms, t), n + 1
        if last_ms is None:
            return
        state.update((start_ms, last_ms, n))
        state.setTimeoutTimestamp(last_ms + gap_ms)
        for c in closed:
            yield emit(*c)

    df = events.withWatermark(ts_col, watermark).withColumn(
        "__us", F.unix_micros(F.col(ts_col))
    )
    return df.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static dimension enrichment — the continuous form of the
    reference-table lookup (S7).

    With ``broadcast_dim`` the join is map-side in every micro-batch:
    no shuffle on the unbounded side and no streaming state at all
    (unlike stream-stream joins, a static side needs no watermark) —
    the 100 TB-safe default for dimension-sized lookups; for a huge
    static side drop the hint and let AQE choose per batch.

    CAVEAT (verified): a path-backed static DataFrame pins its FILE
    LISTING at plan creation — rows in files that existed then are
    re-read per batch, but files added later are invisible. For a
    slowly-changing dimension that gains files between batches use
    :func:`foreach_batch_enrich`, which re-loads the dimension every
    micro-batch, or back the dimension with a catalog table that
    re-resolves.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def foreach_batch_enrich(
    stream: DataFrame,
    dim_loader,
    on: list[str],
    sink,
    how: str = "left",
):
    """SCD-refreshing stream enrichment: ``dim_loader(spark)`` is
    re-invoked EVERY micro-batch (fresh file listing, fresh snapshot),
    the batch joins against that day's dimension map-side, and
    ``sink(enriched_df, batch_id)`` writes the result — the
    ``foreachBatch`` pattern Structured Streaming prescribes for
    joins against data that changes underneath a running query.

    Returns the ``DataStreamWriter`` (call ``.start()`` /
    ``.trigger(...)`` on it). Exactly-once still holds end-to-end if
    ``sink`` is idempotent on ``batch_id`` (micro-batch replays rerun
    the same id).
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        dim = dim_loader(batch_df.sparkSession)
        sink(batch_df.join(F.broadcast(dim), on, how), batch_id)

    return stream.writeStream.foreachBatch(_apply)
