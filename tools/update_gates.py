#!/usr/bin/env python3
"""Re-record gate rows from quiet battery artifacts.

Usage: update_gates.py BENCH_QUIET_A.json [BENCH_QUIET_B.json ...] [--apply]

Policy (r16):
- isolated-block queries take the MAX isolated-slot reading across the
  given artifacts (brief #3 — the block now ALWAYS runs in its own
  child JVM, so isolated readings are the apples-to-apples basis;
  max-of-quiet-runs is conservative: future batteries cannot
  false-breach on run-to-run jitter);
- queries with no gate yet are added at their max reading across the
  artifacts (same conservatism for brand-new rows);
- carried battery gates are NEVER touched here — on a contended day a
  blanket re-record would bake steal windows into the gate file.
"""
import json, sys

files = [a for a in sys.argv[1:] if not a.startswith("--")]
apply = "--apply" in sys.argv
gates = json.load(open("tools/gate_rows.json"))
best = {}
slots = {}
for f in files:
    art = json.load(open(f))
    for q, sec in art["queries"].items():
        if sec < 0:
            continue
        slot = art["query_ctx"].get(q, {}).get("slot", "battery")
        if q not in best or sec > best[q]:
            best[q] = sec
        slots.setdefault(q, set()).add(slot)
changed = []
for q, sec in sorted(best.items()):
    old = gates.get(q)
    if "isolated_block" in slots[q]:
        if old is None or abs(sec - round(sec, 2)) >= 0 and round(sec, 2) != old:
            changed.append((q, old, round(sec, 2), "isolated slot (max of runs)"))
            gates[q] = round(sec, 2)
    elif old is None:
        changed.append((q, None, round(sec, 2), "new query (max of runs)"))
        gates[q] = round(sec, 2)
for q, old, new, why in changed:
    print(f"{q}: {old} -> {new} ({why})")
print(f"{len(changed)} gate rows updated, {len(gates)} total")
if apply:
    json.dump(dict(sorted(gates.items())),
              open("tools/gate_rows.json", "w"), indent=1)
    print("written tools/gate_rows.json")
