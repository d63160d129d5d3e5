#!/usr/bin/env python3
"""Generate the OPTIMIZATION_r20.md appendix: every bench key's
baseline -> final default-pass seconds (plus the adjudicated floor when
one exists), sorted by final time descending."""
import json, sys

base = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "plans/r20/bench_baseline.json"))
fin = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "bench.json"))
bq, fq = base["queries"], fin["queries"]
floors = (fin.get("adjudicated") or {}).get("floors", {}) if isinstance(fin.get("adjudicated"), dict) else {}
aqe = (fin.get("aqe") or {}).get("queries", {}) if isinstance(fin.get("aqe"), dict) else {}

print("## Appendix: every bench key, baseline -> final default-pass seconds")
print()
print(f"Baseline total {base['value']:.1f} s / wall {base.get('wall_sec', '?')} s;"
      f" final total {fin['value']:.1f} s / wall {fin.get('wall_sec', '?')} s."
      f" Final errors: {fin.get('errors', [])}; over-budget after adjudication:"
      f" {(fin.get('adjudicated') or {}).get('over_budget', []) if isinstance(fin.get('adjudicated'), dict) else []}.")
print()
print("| key | baseline s | final s | final AQE s | floor s |")
print("|---|---|---|---|---|")
for k in sorted(fq, key=lambda k: -fq[k]):
    b = f"{bq[k]:.2f}" if k in bq else "-"
    a = f"{aqe[k]:.2f}" if k in aqe else ""
    fl = f"{floors[k]:.2f}" if k in floors else ""
    print(f"| {k} | {b} | {fq[k]:.2f} | {a} | {fl} |")
missing = sorted(set(bq) - set(fq))
if missing:
    print()
    print("Baseline keys absent from the final run (shared-frame "
          "attribution shifts — the frame moved to another forcing "
          "query or was built by the warm-up): " + ", ".join(missing))
