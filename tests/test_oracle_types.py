"""Oracle result-type audit (VERDICT r6 "What's wrong" #1).

The external driver's value hash is TYPE-sensitive: a DuckDB column
that widens to HUGEINT (e.g. ``sum(BIGINT)`` kept wide by ``//``)
hash-mismatches a bit-identical Spark BIGINT column even though every
value compares equal.  ``verify_sweep.py`` / ``test_oracle_parity.py``
normalize values before comparing and are structurally blind to this
(exactly how q163/q188 shipped red in CORRECTNESS_r06 while the parity
sweep stayed green).

This test closes the blind spot permanently: DESCRIBE every
``oracle_sql()`` string against DuckDB (type inference only — the
query is planned, not executed) and assert no result column has a
type Spark cannot emit: HUGEINT / UHUGEINT / INT128.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: DuckDB types with no Spark equivalent in the gate's hash domain.
_FORBIDDEN = ("HUGEINT", "UHUGEINT", "INT128")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


def _oracles():
    return sorted(entrymod.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracles(), ids=[n for n, _ in _oracles()])
def test_no_hugeint_in_oracle_result(duck, name, sql):
    rows = duck.execute(f"DESCRIBE {sql}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if any(f in typ.upper() for f in _FORBIDDEN)
    ]
    assert not bad, (
        f"{name}: oracle result leaks driver-unhashable integer width "
        f"{bad} — wrap the final expression in CAST(... AS BIGINT)"
    )
