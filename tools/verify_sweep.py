"""Verify sweep: run every registered query on a VANILLA SparkSession
with a hostile (non-UTC) timezone and compare against its DuckDB
oracle — the exact shape of the external correctness gate, minus the
tuned session that tests use (which can hide TZ/conf bugs).

Usage:
    python tools/verify_sweep.py              # all queries at sf0.001
    python tools/verify_sweep.py q29 q105     # only these prefixes
    VERIFY_SF=/root/testdata/sf0.01 python tools/verify_sweep.py
    VERIFY_TZ=Asia/Kathmandu python tools/verify_sweep.py   # other hostile TZ

Exits non-zero on any mismatch. See .claude/skills/verify/SKILL.md.
"""
import math
import os
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("VERIFY_SF", "/root/testdata/sf0.001")
ONLY = [a for a in sys.argv[1:]]

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", os.environ.get("VERIFY_TZ", "America/Bogota"))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as m

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.12g}"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    out.sort()
    return out


q, o = m.queries(), m.oracle_sql()
# smoke
n = m.entry(spark).count()
print(f"entry smoke: {n} rows", flush=True)

names = [x for x in q if x in o and (not ONLY or any(x.startswith(p) for p in ONLY))]
fails = []
for name in names:
    t0 = time.perf_counter()
    try:
        sdf = q[name](spark, SF_DIR)
        srows = sdf.collect()
        scols = sdf.columns
        res = con.execute(o[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        ok_n = len(srows) == len(drows)
        ok_v = ok_cols and ok_n and norm_rows(scols, [tuple(r) for r in srows]) == norm_rows(dcols, drows)
        status = "OK" if (ok_cols and ok_n and ok_v) else f"FAIL cols={ok_cols} n={ok_n}({len(srows)}/{len(drows)}) vals={ok_v}"
    except Exception as e:
        status = f"ERROR {type(e).__name__}: {e}"[:200]
    dt = time.perf_counter() - t0
    if not status.startswith("OK"):
        fails.append(name)
    print(f"{name}: {status} ({dt:.1f}s)", flush=True)

print(f"DONE {len(names) - len(fails)}/{len(names)} ok; fails={fails}", flush=True)
spark.stop()
sys.exit(1 if fails else 0)
