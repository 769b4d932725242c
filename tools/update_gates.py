#!/usr/bin/env python3
"""Re-record gate rows from a quiet battery artifact.

Usage: update_gates.py BENCH_QUIET_rN.json [--apply]

Policy (r16): every query in the artifact gets a gate row; the
isolated-block queries take their ISOLATED-slot reading (brief #3 —
gate rows for the driver-loop block come from the isolated slot, so
battery position can never swing them); other queries keep their
existing gate unless the new reading differs by >25% on a quiet run
(drift both ways is re-recorded to keep gates honest); queries with
no gate yet are added at the measured reading.
"""
import json, sys

art = json.load(open(sys.argv[1]))
apply = "--apply" in sys.argv
gates = json.load(open("tools/gate_rows.json"))
qs, ctx = art["queries"], art["query_ctx"]
changed = []
for q, sec in sorted(qs.items()):
    if sec < 0:
        continue
    slot = ctx.get(q, {}).get("slot", "battery")
    old = gates.get(q)
    if slot == "isolated_block":
        if old is None or abs(sec - old) / max(old, 1e-9) > 0.10:
            changed.append((q, old, round(sec, 2), "isolated slot"))
            gates[q] = round(sec, 2)
    elif old is None:
        changed.append((q, None, round(sec, 2), "new query"))
        gates[q] = round(sec, 2)
    elif abs(sec - old) / old > 0.25:
        changed.append((q, old, round(sec, 2), "quiet drift >25%"))
        gates[q] = round(sec, 2)
for q, old, new, why in changed:
    print(f"{q}: {old} -> {new} ({why})")
print(f"{len(changed)} gate rows updated, {len(gates)} total")
if apply:
    json.dump(dict(sorted(gates.items())), open("tools/gate_rows.json", "w"), indent=1)
    print("written tools/gate_rows.json")
