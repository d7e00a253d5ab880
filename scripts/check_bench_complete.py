"""Assert a committed bench sweep covers EVERY registry entry.

Round-6 gap class: late-added entries (`orders_trimmed_mean`,
`orders_snapshot_expire`) were missing from the committed
`BENCH_LOCAL_r6.json` because the sweep ran before they landed. This check
makes the gap impossible to recommit: run it on any bench JSON whose
``queries`` map claims to be a full sweep.

Usage: python scripts/check_bench_complete.py BENCH_LOCAL_r7.json [...]
Exit 1 + a named diff if any registry entry is missing or unknown.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as entry

    # local sweeps must cover the FULL surface: driver-billed entries plus
    # any moved to the extended (local-only) registry by the bench-budget
    # split — the split shrinks the driver's bill, never local coverage
    registry = set(entry.queries())
    if hasattr(entry, "queries_extended"):
        registry |= set(entry.queries_extended())
    rc = 0
    for path in sys.argv[1:]:
        with open(path) as fh:
            # bench files may hold one JSON object or one-per-line; take the
            # first line carrying a queries map
            doc = None
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                cand = json.loads(line)
                if "queries" in cand:
                    doc = cand
                    break
        if doc is None:
            print(f"{path}: no queries map found")
            rc = 1
            continue
        benched = set(doc["queries"])
        missing = sorted(registry - benched)
        unknown = sorted(benched - registry)
        if missing or unknown:
            print(f"{path}: INCOMPLETE — missing={missing} unknown={unknown}")
            rc = 1
        else:
            print(f"{path}: complete ({len(benched)}/{len(registry)} entries)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
