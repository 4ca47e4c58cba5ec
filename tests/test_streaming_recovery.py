"""Checkpoint restart/recovery law for the two stateful
applyInPandasWithState families (VERDICT r9 Next-round #6): stop the
stream after batch k, restart from the checkpoint with new input, and
the union of emitted rows must equal one uninterrupted run over the
same batch boundaries — per-key STATE (open sessions, applied CDC
sequences) must cross the restart via the state store, and already-
processed files must not replay."""

from __future__ import annotations

import json
import os

from owl_etl_spark.streaming.dedup_stream import streaming_cdc_apply
from owl_etl_spark.streaming.joins import sessionize_stateful

def _run_to_termination(out_df, ckpt: str, out_dir: str):
    """One availableNow execution into a PARQUET sink (the memory sink
    refuses checkpoint recovery — file sinks are the fault-tolerant
    path) → ALL rows accumulated in the sink so far. The checkpoint is
    the identity that carries state across query instances."""
    q = (
        out_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    spark = out_df.sparkSession
    return spark.read.parquet(out_dir).collect()


def _write(src, idx: int, rows: list[dict]) -> None:
    f = src / f"batch{idx}.json"
    f.write_text("".join(json.dumps(r) + "\n" for r in rows))
    os.utime(f, (1700000000 + idx * 100, 1700000000 + idx * 100))


def _sess_stream(spark, src):
    return sessionize_stateful(
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .json(str(src)),
        gap_seconds=1800,
    )


_SESS_FILES = [
    # batch 0: two open sessions (u1 two events, u2 one)
    [
        {"user_id": 1, "ts": "2024-01-01T00:00:00"},
        {"user_id": 1, "ts": "2024-01-01T00:10:00"},
        {"user_id": 2, "ts": "2024-01-01T00:05:00"},
    ],
    # batch 1: u1 extends its OPEN session (within the 30-min gap —
    # only possible if state crossed the restart); u9 pushes the
    # watermark far past u1/u2's gap timers for the next batch
    [
        {"user_id": 1, "ts": "2024-01-01T00:20:00"},
        {"user_id": 9, "ts": "2024-01-01T03:00:00"},
    ],
    # batch 2: unrelated key keeps the stream moving so pending
    # timers evaluate
    [{"user_id": 10, "ts": "2024-01-01T05:00:00"}],
]


def _sess_key(r):
    return (r.user_id, r.session_start_ms, r.session_end_ms, r.n_events)


def test_sessionizer_recovers_open_sessions_across_restarts(spark, tmp_path):
    # interrupted: one availableNow run per arriving file, each a
    # separate query instance resumed from the same checkpoint
    src = tmp_path / "in_a"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_a")
    out_a = str(tmp_path / "out_a")
    got = []
    for i, rows in enumerate(_SESS_FILES):
        _write(src, i, rows)
        got = _run_to_termination(_sess_stream(spark, src), ckpt, out_a)

    # uninterrupted baseline: same files, same one-file batch
    # boundaries, one query instance
    src_b = tmp_path / "in_b"
    src_b.mkdir()
    for i, rows in enumerate(_SESS_FILES):
        _write(src_b, i, rows)
    baseline = _run_to_termination(
        _sess_stream(spark, src_b), str(tmp_path / "ckpt_b"), str(tmp_path / "out_b")
    )

    assert sorted(map(_sess_key, got)) == sorted(map(_sess_key, baseline))
    closed = {r.user_id: r for r in got}
    # u1's closed session spans the restart: batch-0 events + the
    # batch-1 extension → 3 events, boundaries 00:00 → 00:20 UTC
    assert _sess_key(closed[1]) == (1, 1704067200000, 1704068400000, 3)
    # u2 closed with its single batch-0 event, state intact at restart
    assert closed[2].n_events == 1
    assert baseline, "baseline closed no sessions — test is vacuous"


_CDC_FILES = [
    # batch 0: u1 applies seq 002; u2 applies a seq-003 tombstone
    [
        {"k": "u1", "seq": "002", "op": "upsert", "val": "b", "ts": "2024-01-01T00:00:00"},
        {"k": "u2", "seq": "003", "op": "delete", "val": None, "ts": "2024-01-01T00:01:00"},
    ],
    # batch 1 (after restart): two LATE lower-sequence changes that
    # only restored state can suppress, plus one genuinely new key
    [
        {"k": "u1", "seq": "001", "op": "upsert", "val": "a", "ts": "2024-01-01T00:02:00"},
        {"k": "u2", "seq": "002", "op": "upsert", "val": "y", "ts": "2024-01-01T00:03:00"},
        {"k": "u3", "seq": "001", "op": "upsert", "val": "z", "ts": "2024-01-01T00:04:00"},
    ],
]


def _cdc_stream(spark, src):
    return streaming_cdc_apply(
        spark.readStream.schema("k string, seq string, op string, val string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .json(str(src)),
        ["k"],
        "seq",
        "op",
        "ts",
        delete_ops=("delete",),
        state_timeout_ms=None,
    )


def _cdc_key(r):
    return (r.k, r.seq, r.op, r.val, r.is_delete)


def test_cdc_restart_suppresses_late_changes_via_restored_state(spark, tmp_path):
    src = tmp_path / "cdc_a"
    src.mkdir()
    ckpt = str(tmp_path / "cdc_ckpt_a")
    out_a = str(tmp_path / "cdc_out_a")
    _write(src, 0, _CDC_FILES[0])
    run1 = _run_to_termination(_cdc_stream(spark, src), ckpt, out_a)
    assert sorted(map(_cdc_key, run1)) == [
        ("u1", "002", "upsert", "b", False),
        ("u2", "003", "delete", None, True),
    ]

    _write(src, 1, _CDC_FILES[1])
    both = _run_to_termination(_cdc_stream(spark, src), ckpt, out_a)
    run2 = sorted(map(_cdc_key, both))
    for k in map(_cdc_key, run1):
        run2.remove(k)
    # the sharpest recovery evidence: the late u1/u2 changes are
    # suppressed by the RESTORED applied-sequence state (lost state
    # would wrongly emit them — u2 would be un-deleted); only the new
    # key emits. And batch 0's file did not replay.
    assert run2 == [("u3", "001", "upsert", "z", False)]

    # uninterrupted baseline over the same batch boundaries
    src_b = tmp_path / "cdc_b"
    src_b.mkdir()
    for i, rows in enumerate(_CDC_FILES):
        _write(src_b, i, rows)
    baseline = _run_to_termination(
        _cdc_stream(spark, src_b), str(tmp_path / "cdc_ckpt_b"), str(tmp_path / "cdc_out_b")
    )
    assert sorted(map(_cdc_key, both)) == sorted(map(_cdc_key, baseline))
