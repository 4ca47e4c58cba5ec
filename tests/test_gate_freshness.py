"""Gate-freshness guard (VERDICT r3 "Next round" #1).

The external correctness gate checks only the first
``GATE_WINDOW`` entries of ``queries()`` each round. These tests make
it IMPOSSIBLE to land a behavior change to a registered query without
either (a) moving it into the gate window via ``_PRIORITY`` or
(b) re-stamping the manifest right after a green verification run —
the exact stale-evidence gap that recurred in rounds 2 (q27/q34) and
3 (q85/q95).

No Spark session needed: hashing is pure static analysis.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from tools.gate_manifest import (
    GATE_WINDOW,
    compute_hashes,
    load_manifest,
    stale_gate_violations,
)


def test_changed_queries_are_inside_the_gate_window():
    """Every query whose current behavior hash differs from its
    verified-green manifest hash (or which is new) must appear in the
    first GATE_WINDOW entries of queries(), where the driver gate will
    re-check it this round."""
    manifest = load_manifest()
    current = compute_hashes(entry_mod)
    order = list(entry_mod.queries())
    violations = stale_gate_violations(manifest, current, order, GATE_WINDOW)
    assert violations == [], (
        f"queries changed since their last verified-green stamp but NOT "
        f"in the first {GATE_WINDOW} gate slots: {violations}. Either "
        f"reorder _PRIORITY to lead with them, or re-verify (tools/"
        f"verify_sweep.py) and re-stamp (tools/stamp_manifest.py)."
    )


def test_manifest_covers_every_registered_query():
    """A query missing from the manifest entirely must also sit in the
    gate window (covered above) — but the steady state is full
    coverage; alert if the manifest has drifted structurally."""
    manifest = load_manifest()
    order = list(entry_mod.queries())
    missing = [n for n in order[GATE_WINDOW:] if n not in manifest]
    assert missing == [], f"queries absent from gate_manifest.json: {missing}"


def test_guard_detects_a_synthetic_late_edit():
    """The guard itself must trip: perturb one outside-the-window
    query's manifest hash (simulating a code edit after stamping) and
    assert it is reported."""
    current = compute_hashes(entry_mod)
    order = list(entry_mod.queries())
    victim = order[GATE_WINDOW + 3]
    tampered = dict(current)
    tampered[victim] = "0" * 64
    assert stale_gate_violations(tampered, current, order, GATE_WINDOW) == [victim]


def test_hash_tracks_library_dependencies():
    """q95's round-3 change lived in operators/profile.py, not in
    __spark_entry__.py — the hash must cover transitively imported
    library modules, not just the function body."""
    import ast
    import inspect
    import textwrap

    from tools.gate_manifest import _closure_files, _imports_in

    func, _ = entry_mod._REGISTRY["q95_table_profile"]
    src = textwrap.dedent(inspect.getsource(func))
    files = _closure_files(_imports_in(ast.parse(src)))
    assert any(f.endswith(os.path.join("operators", "profile.py")) for f in files), files
