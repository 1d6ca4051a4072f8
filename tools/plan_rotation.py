"""Gate-rotation planner: turn a round's CORRECTNESS_r{N}.json into
the next round's registry edits.

Prints (a) the names to append to ``registry.PRIOR_GATED`` (this
round's green rows), (b) any red rows (keep them gated next round so
the fix re-gates), and (c) the still-ungated queries that must lead
the next window (current R05_QUEUE members plus anything else without
a prior CORRECTNESS row).

Usage:
    python tools/plan_rotation.py CORRECTNESS_r04.json
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_r04.json"
    rows = json.load(open(path))

    from datafusion_functions_financial_spark.plans import registry

    green = sorted(
        n for n, r in rows.items()
        if r.get("rows_match") and r.get("schema_match")
        and r.get("hash_match")
    )
    red = sorted(set(rows) - set(green))
    gated_after = registry.PRIOR_GATED | set(green)
    ungated = sorted(
        n for n in registry.all_queries() if n not in gated_after
    )

    print(f"# {path}: {len(green)} green, {len(red)} red")
    print("\n# Append to PRIOR_GATED:")
    for n in green:
        if n not in registry.PRIOR_GATED:
            print(f'    "{n}",')
    if red:
        print("\n# RED rows — diagnose, fix, keep in next window:")
        for n in red:
            print(f"    {n}: {rows[n]}")
    print(f"\n# Still ungated ({len(ungated)}) — must lead the next "
          f"window (or sit in the next queue):")
    for n in ungated:
        print(f"    {n}")
    win = registry.gate_window_names()
    missing = [n for n in ungated if n not in win and n not in red]
    print(f"\n# Of those, NOT in the current first-{registry.GATE_WINDOW}"
          f" window: {len(missing)} (reorder _MODULES so they lead)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
