"""Stamp tools/gate_manifest.json with each query's current behavior
hash. Run ONLY immediately after a green verification (a full
``tools/verify_sweep.py`` pass or a green driver CORRECTNESS round) —
the stamp is the record that these exact hashes were verified.

    python tools/stamp_manifest.py            # stamp all queries
    python tools/stamp_manifest.py q85 q95    # re-stamp only these
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gate_manifest import MANIFEST_PATH, compute_hashes  # noqa: E402


def main() -> None:
    import __spark_entry__ as m

    current = compute_hashes(m)
    only = sys.argv[1:]
    if only:
        prev = {}
        if os.path.exists(MANIFEST_PATH):
            prev = json.load(open(MANIFEST_PATH, encoding="utf-8"))
        for name in list(current):
            if not any(name == p or name.startswith(p + "_") for p in only):
                if name in prev:
                    current[name] = prev[name]
                else:
                    del current[name]
    with open(MANIFEST_PATH, "w", encoding="utf-8") as fh:
        json.dump(dict(sorted(current.items())), fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"stamped {len(current)} queries -> {MANIFEST_PATH}")


if __name__ == "__main__":
    main()
