"""Registry-wide hygiene invariants for the driver contract — cheap
meta-checks that catch wiring mistakes (duplicate query numbers, a
priority entry that silently stopped resolving, an empty oracle
string) before they cost a driver round."""

from __future__ import annotations

import re

import __spark_entry__ as entrymod


def test_names_are_well_formed_and_numbers_unique():
    names = list(entrymod.queries())
    nums = []
    for n in names:
        m = re.match(r"^q(\d+)_[a-z0-9_]+$", n)
        assert m, f"malformed query name: {n}"
        nums.append(int(m.group(1)))
    assert len(nums) == len(set(nums)), "duplicate query numbers"


def test_oracles_are_nonempty_selects():
    for name, sql in entrymod.oracle_sql().items():
        s = sql.strip()
        assert s, f"{name}: empty oracle"
        assert s.upper().startswith(("SELECT", "WITH")), f"{name}: oracle shape"


def test_priority_window_is_exactly_fifty_and_resolves():
    names = list(entrymod.queries())
    head = names[:50]
    assert len(set(head)) == 50
    # every priority prefix resolved (queries() asserts this too, but
    # a failure there surfaces as an opaque registration error)
    prefixes = {n.split("_")[0] for n in names}
    for p in entrymod._PRIORITY:
        assert p in prefixes, f"priority entry {p} no longer resolves"


def test_rows_only_queries_are_none():
    # Round 11 retired the last rows-only entries: q227/q250 gained
    # recursive-CTE DP oracles (VERDICT r10 Next-round #2). Every
    # registered query must now carry a DuckDB oracle.
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert q - o == set(), (
        "a query lost its oracle — the program has zero declared "
        "rows-only entries since round 11"
    )


def test_every_query_function_has_a_docstring():
    for name, fn in entrymod.queries().items():
        assert fn.__doc__ and len(fn.__doc__) >= 30, f"{name}: missing docstring"
