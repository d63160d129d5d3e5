#!/usr/bin/env python3
"""Compare a 10x soak bench run against its sf0.1 base run.

Usage: soak_compare.py <base.json> <soak.json> <factor>

For each catalog entry and shared frame present in both runs, report
soak_sec / base_sec and flag ratios above the factor (superlinearity
alarm). Entries re-measured by Bench's in-run quiet retry use the retry
time (the retry exists to separate load noise from real cost).
"""
import json, sys

def load(p):
    b = json.load(open(p))
    t = dict(b["queries"])
    for k, v in (b.get("retry") or {}).items():
        if isinstance(v, dict) and v.get("pass") == "default":
            t[k] = v["sec"]
    return t

def main():
    base, soak, factor = load(sys.argv[1]), load(sys.argv[2]), float(sys.argv[3])
    rows, alarms = [], []
    for k in sorted(base):
        if k not in soak:
            continue
        b, s = base[k], soak[k]
        # frame tags are dir-qualified (sf0.1:... vs sf1:...) — match by suffix
        ratio = s / b if b > 0.05 else float("nan")
        rows.append((k, b, s, ratio))
        if b > 0.2 and ratio == ratio and ratio > factor:
            alarms.append((k, b, s, ratio))
    # frames: keys differ by dir prefix; pair by tag suffix
    def frames(t):
        return {k.split(":", 2)[-1]: v for k, v in t.items() if k.startswith("frame:")}
    fb, fs = frames(base), frames(soak)
    for tag in sorted(fb):
        if tag in fs:
            b, s = fb[tag], fs[tag]
            ratio = s / b if b > 0.05 else float("nan")
            rows.append((f"frame:{tag}", b, s, ratio))
            if b > 0.2 and ratio == ratio and ratio > factor:
                alarms.append((f"frame:{tag}", b, s, ratio))
    print(f"{'entry':42s} {'base_s':>8s} {'soak_s':>8s} {'ratio':>7s}")
    for k, b, s, r in rows:
        print(f"{k:42s} {b:8.2f} {s:8.2f} {r:7.2f}" if r == r else f"{k:42s} {b:8.2f} {s:8.2f}     n/a")
    print()
    if alarms:
        print(f"SUPERLINEAR (> {factor:.0f}x): " + ", ".join(f"{k} ({r:.1f}x)" for k, b, s, r in alarms))
        sys.exit(1)
    print(f"OK: no entry above {factor:.0f}x")

main()
