"""Streaming latest-per-key — the reference's recency upsert (W1/F4)
as a continuous operator.

In the reference, a newer fact sheet replaces the stored one and an
older arrival is dropped (src/etl/load.py:99-219). Streamed, that is
last-value-per-key with event-time ordering and bounded lateness:

- ``dropDuplicatesWithinWatermark`` handles the exact-duplicate case;
- the recency rule needs per-key state → ``applyInPandasWithState``
  keeping the max-recency row per key, emitting only improvements.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_INTEGRALS = ("tinyint", "smallint", "int", "bigint")


def _ordered_str_col(stream: DataFrame, col: str, out: str) -> tuple[DataFrame, str]:
    """State comparisons below are LEXICOGRAPHIC on strings (the state
    store holds one string scalar). For integral columns, '9' > '10'
    would pick the wrong winner — normalize to a zero-padded 20-digit
    string whose lexicographic order equals numeric order. Non-negative
    values ONLY, and that contract is ENFORCED at runtime (the batch
    fails on the first negative): '-' sorts before '0' and magnitude
    order INVERTS among negatives, so a signed sequence (a delta/LSN
    offset) would silently pick wrong winners — bias such columns to
    ≥ 0 before streaming them. Floats/decimals are rejected up front:
    no padding makes their text order numeric — pre-convert to an
    integral or a caller-ordered string. String columns pass through
    unchanged (the caller owns their ordering semantics)."""
    dt = dict(stream.dtypes).get(col)
    if dt in _INTEGRALS:
        padded = F.when(
            F.col(col) < 0,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"{col} must be non-negative for lexicographic "
                        "state ordering (zero-padding breaks on '-'), got "
                    ),
                    F.col(col).cast("string"),
                )
            ).cast("string"),
        ).otherwise(F.format_string("%020d", F.col(col)))
        return stream.withColumn(out, padded), out
    if dt in ("float", "double") or (dt or "").startswith("decimal"):
        raise ValueError(
            f"{col} is {dt}: float/decimal sequence columns have no "
            "lexicographic-safe encoding — cast to an integral (epoch "
            "micros, LSN) or a caller-ordered string first"
        )
    return stream, col


def streaming_latest_per_key(
    stream: DataFrame,
    keys: list[str],
    recency_col: str,
    watermark_col: str,
    watermark: str = "1 day",
    state_timeout_ms: int | None = 7 * 24 * 3600 * 1000,
) -> DataFrame:
    """Continuously emit the newest-seen row per key.

    Output is an append stream of improvements (a row is emitted only
    when it beats the stored recency for its key — downstream sinks see
    a changelog they can upsert). State: one scalar recency per key,
    expired by processing-time timeout after quiet periods. At 100 TB
    of keys, state is sharded by the groupBy hash shuffle across the
    cluster; per-key state is O(bytes).

    ``state_timeout_ms=None`` disables the quiet-key GC timeout — see
    the ``streaming_cdc_apply`` docstring: required for bounded
    ``availableNow`` runs to terminate.

    Ordering contract: winners compare as STRINGS in the state store.
    Integral ``recency_col`` values are auto-normalized to zero-padded
    strings (numeric order == lexicographic; non-negative only);
    string columns compare as given — zero-pad them yourself if they
    encode numbers; float/decimal columns are rejected.
    """
    schema = stream.schema
    work, cmp_col = _ordered_str_col(stream, recency_col, "__rec")

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # quiet-key GC: drop the per-key scalar and emit nothing
            state.remove()
            return
        best = state.get[0] if state.exists else None
        out = []
        for pdf in pdfs:
            pdf = pdf[pdf[cmp_col].notna()]
            if pdf.empty:
                continue
            # vectorized improvement scan (no per-row Python loop — a
            # hot key receiving thousands of events per micro-batch
            # stays Arrow/numpy-speed): after a stable ascending sort
            # on the comparison string, a row beats every earlier row
            # iff it differs from its predecessor (sorted ⇒ cummax ==
            # self, and ≥ predecessor always holds), and it beats the
            # stored state iff it exceeds ``best``.
            pdf = pdf.sort_values(cmp_col, kind="stable").reset_index(drop=True)
            s = pdf[cmp_col].astype(str)
            mask = s.ne(s.shift(1))
            if best is not None:
                mask &= s > str(best)
            if mask.any():
                out.append(pdf[mask])
                top = s.iloc[-1]
                if best is None or top > str(best):
                    best = top
        if best is not None:
            state.update((str(best),))
            if state_timeout_ms is not None:
                state.setTimeoutDuration(state_timeout_ms)
        if out:
            res = pd.concat(out)
            if cmp_col == "__rec":
                res = res.drop(columns=["__rec"])
            yield res

    cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    return (
        work.withWatermark(watermark_col, watermark)
        .groupBy(*keys)
        .applyInPandasWithState(
            fn,
            outputStructType=cols,
            stateStructType="best string",
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if state_timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def streaming_cdc_apply(
    stream: DataFrame,
    keys: list[str],
    sequence_col: str,
    op_col: str,
    watermark_col: str,
    delete_ops: tuple[str, ...] = ("delete",),
    watermark: str = "1 day",
    state_timeout_ms: int | None = 7 * 24 * 3600 * 1000,
) -> DataFrame:
    """Continuous CDC apply — the streaming twin of
    ``operators.cdc.apply_changes``.

    Emits an upsert/delete CHANGELOG: per micro-batch and key, only the
    highest-sequence change is emitted, and only if it beats the
    sequence already applied (stored in state) — intra-batch churn is
    compacted away, and a late or re-delivered old change never
    un-deletes or regresses a key (replay-safe). Each emitted row
    carries ``is_delete`` so a downstream sink applies it as MERGE
    (upsert) or DELETE (tombstone).

    State per key is ONE scalar (the applied sequence) — at 100 TB of
    keys the state store shards across the cluster on the groupBy
    hash, and the processing-time timeout bounds quiet-key retention.

    ``state_timeout_ms=None`` disables the quiet-key GC timeout
    entirely. REQUIRED for bounded ``trigger(availableNow=True)``
    replays: with ProcessingTimeTimeout registered, the engine keeps
    scheduling no-data micro-batches to re-evaluate pending timeouts,
    so an availableNow query never reaches termination (observed:
    46+ empty ``{"logOffset":0}`` batches). Continuous production
    queries should keep a timeout so quiet keys are dropped.

    Ordering contract: sequences compare as STRINGS in the state
    store. Integral ``sequence_col`` values are auto-normalized to
    zero-padded strings (numeric order == lexicographic; non-negative
    only); string columns compare as given — zero-pad them yourself if
    they encode numbers; float/decimal columns are rejected.
    """
    schema = stream.schema
    work, cmp_col = _ordered_str_col(stream, sequence_col, "__seq")

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # quiet-key GC: drop the applied-sequence scalar
            state.remove()
            return
        best = state.get[0] if state.exists else None
        winner = None
        for pdf in pdfs:
            pdf = pdf[pdf[cmp_col].notna()]
            if pdf.empty:
                continue
            top = pdf.loc[pdf[cmp_col].astype(str).idxmax()]
            if winner is None or str(top[cmp_col]) > str(winner[cmp_col]):
                winner = top
        if winner is not None and (best is None or str(winner[cmp_col]) > best):
            state.update((str(winner[cmp_col]),))
            if state_timeout_ms is not None:
                state.setTimeoutDuration(state_timeout_ms)
            res = winner.to_frame().T
            if cmp_col == "__seq":
                res = res.drop(columns=["__seq"])
            res["is_delete"] = res[op_col].isin(list(delete_ops))
            yield res

    cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    cols += ", is_delete boolean"
    return (
        work.withWatermark(watermark_col, watermark)
        .groupBy(*keys)
        .applyInPandasWithState(
            fn,
            outputStructType=cols,
            stateStructType="best string",
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if state_timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def streaming_exact_dedup(
    stream: DataFrame,
    keys: list[str],
    watermark_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact-duplicate suppression in flight: first arrival per key
    wins, re-deliveries within the watermark horizon are dropped.

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``):
    state for a key is EVICTED once the watermark passes its event
    time + delay, so state size tracks the lateness window, not the
    full key history — the property that lets an at-least-once
    ingest (Kafka replays, reference re-drops of a month folder —
    src/etl/load.py's re-run semantics) run forever without unbounded
    state. Keys shard across the cluster on the groupBy hash; dropping
    is per-key O(1). Downstream of this, counts and sums see
    exactly-once rows.
    """
    return stream.withWatermark(watermark_col, watermark).dropDuplicatesWithinWatermark(keys)


def streaming_near_dup_band_counts(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Streaming NEAR-duplicate signature monitor — the continuous
    form of the MinHash-LSH banding family (q34/q98): as documents
    stream in, each row computes its md5-portable MinHash signature
    INTRA-ROW (the map-only ``with_minhash`` form — no explode/groupBy
    signature stage, because a streaming source can't re-shuffle per
    row the way the batch fast-path does), explodes into ``bands``
    (band, band-signature) keys, and a streaming aggregate maintains
    per-signature cluster sizes. A bucket whose count grows past 1 is
    a LIVE near-duplicate cluster — the alert a crawl pipeline wants
    the moment a template flood starts, rather than at the nightly
    batch dedup.

    Output (complete mode): ``(band, sig, n_docs, min_doc_id)`` — the
    minimum member id is the deterministic cluster representative
    (dropDuplicates-style "first seen" would be partition-order
    dependent and ungateable). With a bounded availableNow run the
    final state equals the batch GROUP BY, so the q34 oracle machinery
    replays it exactly in SQL. State is one row per (band, distinct
    band-signature) — bounded by corpus vocabulary of signatures, the
    same cardinality the batch LSH join would shuffle."""
    from owl_etl_spark.operators.dedup import with_minhash

    rows_per_band = int(num_hashes) // int(bands)
    sig = with_minhash(stream.select(id_col, text_col), text_col, num_hashes)
    banded = sig.select(
        F.col(id_col).alias("__id"),
        "minhash",
        F.explode(F.expr(f"sequence(0, {int(bands) - 1})")).alias("band"),
    ).select(
        "__id",
        "band",
        F.expr(
            "array_join(transform("
            f"slice(minhash, band * {rows_per_band} + 1, {rows_per_band}), "
            "h -> cast(h as string)), '_')"
        ).alias("sig"),
    )
    return banded.groupBy("band", "sig").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("__id").cast("long").alias("min_doc_id"),
    )
