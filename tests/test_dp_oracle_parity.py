"""Randomized parity for the q227/q250 recursive-CTE DP oracles
(round 12 — VERDICT r11 ADVICE #5): the DTW min-plus and NW/SW
max-plus unrolls are intricate (BIG sentinels, band boundaries,
prefix-sum/running-extremum closed forms) and the fixed-corpus sweep
alone cannot distinguish "correct algebra" from "correct on this
corpus". Here the SAME registered oracle SQL runs in DuckDB against
seeded RANDOM event series — including pairs whose length difference
reaches EXACTLY the DTW band (the largest the library's banded-path
feasibility guard admits), the regime where the sentinel/boundary
algebra binds — and must match the Spark library result row for row.

The synthetic events.parquet is written with TIMESTAMP(NANOS) physical
type via pyarrow, the real testdata shape (Spark reads it as bigint
under nanosAsLong; DuckDB as TIMESTAMP_NS), so the queries run against
it completely unchanged."""

import math
import random

import pytest


def _write_events(tmp_path, seed: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    ets, tss, vals = [], [], []
    base = rng.randint(20, 34)
    for t in range(5):
        et = f"type_{seed}_{t}"
        # lengths base±8: pairs differ by up to EXACTLY the DTW band
        # (16) — the band-boundary regime where the sentinel algebra
        # binds — while staying inside the library's banded-path
        # feasibility guard (dtw_pairs refuses |len_a - len_b| > band)
        n_days = base + rng.randint(-8, 8)
        for d in range(n_days):
            for _ in range(rng.randint(1, 3)):
                ets.append(et)
                tss.append((d * 86400 + rng.randint(0, 86399)) * 10**9)
                vals.append(rng.randint(-50000, 50000) / 100.0)
    table = pa.table(
        {
            "event_id": pa.array(range(len(ets)), type=pa.int64()),
            "user_id": pa.array([i % 7 for i in range(len(ets))], type=pa.int64()),
            "event_type": pa.array(ets, type=pa.string()),
            "ts": pa.array(tss, type=pa.timestamp("ns")),
            "value": pa.array(vals, type=pa.float64()),
        }
    )
    out = str(tmp_path / "events.parquet")
    pq.write_table(table, out)
    return str(tmp_path)


def _norm(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            return "nan" if math.isnan(v) else f"{v:.12g}"
        return str(v)

    return sorted(tuple(cell(r[i]) for i in idx) for r in rows)


@pytest.mark.parametrize("seed", [3, 11, 29])
@pytest.mark.parametrize("qname", ["q227_event_series_dtw", "q250_sequence_alignment"])
def test_dp_oracle_sql_matches_library_on_random_series(spark, tmp_path, seed, qname):
    import duckdb

    import __spark_entry__ as entry_mod

    sf_dir = _write_events(tmp_path, seed)
    fn, sql = entry_mod._REGISTRY[qname]
    sdf = fn(spark, sf_dir)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    assert srows, "random corpus produced no pairs — test is vacuous"

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _norm(scols, srows) == _norm(dcols, drows)
