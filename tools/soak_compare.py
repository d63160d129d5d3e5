#!/usr/bin/env python3
"""Compare a replicated-soak bench run against its base run, with the
bench harness's retry-block discipline applied to the SWEEP itself: any
entry whose soak/base ratio exceeds the factor is RE-MEASURED SOLO in a
fresh JVM, automatically, and the emitted artifact records BOTH numbers
(the in-sweep spike and the solo floor) — so SOAK.md is generated from a
self-adjudicating artifact with zero hand-adjudicated rows. (The r18/r19
soaks saw in-sweep single-key spikes — x218 76.5 s in-sweep vs 3.89 s
solo — that previously needed a by-hand re-run and a prose caveat.)

Usage: soak_compare.py <base.json> <soak.json> <factor>
           [--remeasure-sfdir DIR] [--warm-dir DIR] [--out artifact.json]
           [--max-solo N]

Without --remeasure-sfdir the script only reports (the old behavior).
With it, each over-factor entry re-runs via
  SPARK_GRAFT_ONLY=<key> SPARK_GRAFT_SF_DIR=DIR sbt "runMain graft.Bench"
one key per JVM (the in-sweep spike signature IS shared-JVM heap/load,
so the floor needs an unshared JVM), AQE twin off, scan priming on.
A frame:<tag> alarm re-measures through the query that built it (the
artifact's shared_frames map); the solo run re-emits the frame row.

Per-key numbers prefer Bench's own self-adjudication: the minimum of
the sweep value, `adjudicated.floors`, and any `retry[...].secs` —
then the solo value on top. Exit 1 only if an entry stays over the
factor AFTER solo adjudication.
"""
import json, os, subprocess, sys, tempfile


def load(path):
    b = json.load(open(path))
    t = dict(b["queries"])
    # in-run quiet retries (schema since r19: {"secs": [..], "pass": ..})
    for k, v in (b.get("retry") or {}).items():
        if isinstance(v, dict):
            secs = v.get("secs") or ([v["sec"]] if "sec" in v else [])
            if secs and k in t and t[k] >= 0:
                t[k] = min([t[k]] + secs)
    # the artifact's own min-across-passes floors are the best in-run view
    adj = (b.get("adjudicated") or {}) or {}
    for k, f in (adj.get("floors") or {}).items():
        if k in t and t[k] >= 0:
            t[k] = min(t[k], f)
    return t, b


def frame_tag(key):
    return key.split(":", 2)[-1] if key.startswith("frame:") else None


def solo_measure(key, builder, sfdir, warm_dir):
    """One fresh-JVM scoped bench run; returns {key: sec} for every row
    the run emits (the target plus any frames it forces)."""
    out = tempfile.NamedTemporaryFile(suffix=".json", delete=False).name
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_ONLY": builder,
        "SPARK_GRAFT_SF_DIR": sfdir,
        "SPARK_GRAFT_AQE_TWIN": "0",
        "SPARK_GRAFT_RETRY_ROUNDS": "0",
        "SPARK_GRAFT_BENCH_OUT": out,
        "SPARK_GRAFT_BENCH_PARTIAL": out + ".partial.jsonl",
    })
    if warm_dir:
        env["SPARK_GRAFT_WARM_DIR"] = warm_dir
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       env=env, capture_output=True, text=True)
    try:
        qs = json.load(open(out))["queries"]
    except Exception:
        print(f"  solo re-measure of {key} via {builder} FAILED "
              f"(rc={r.returncode}); keeping the in-sweep number",
              file=sys.stderr)
        return {}
    finally:
        for p in (out, out + ".partial.jsonl"):
            try: os.unlink(p)
            except OSError: pass
    return {k: v for k, v in qs.items() if v >= 0}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {}
    it = iter(sys.argv[1:])
    for a in it:
        if a.startswith("--"):
            opts[a[2:]] = next(it)
    base_path, soak_path, factor = args[0], args[1], float(args[2])
    base, _ = load(base_path)
    soak, soak_art = load(soak_path)
    builders = soak_art.get("shared_frames") or {}

    rows = []   # key -> [base, soak, ratio]
    def add(key, b, s):
        ratio = s / b if b > 0.05 else float("nan")
        rows.append({"key": key, "base_sec": b, "soak_sec": s,
                     "ratio": None if ratio != ratio else ratio})
    for k in sorted(base):
        if k in soak and not k.startswith("frame:"):
            add(k, base[k], soak[k])
    # frame tags are dir-qualified (sf0.1:... vs soak-dir:...) — pair by suffix
    fb = {frame_tag(k): v for k, v in base.items() if k.startswith("frame:")}
    fs = {frame_tag(k): v for k, v in soak.items() if k.startswith("frame:")}
    for tag in sorted(fb):
        if tag in fs:
            add(f"frame:{tag}", fb[tag], fs[tag])

    alarms = [r for r in rows
              if r["base_sec"] > 0.2 and r["ratio"] and r["ratio"] > factor]
    sfdir = opts.get("remeasure-sfdir")
    max_solo = int(opts.get("max-solo", "8"))
    if alarms and sfdir:
        todo = alarms[:max_solo]
        if len(alarms) > max_solo:
            print(f"NOTE: {len(alarms)} alarms, re-measuring only the "
                  f"first {max_solo} (raise --max-solo)", file=sys.stderr)
        for r in todo:
            key = r["key"]
            tag = frame_tag(key)
            builder = None
            if tag is None:
                builder = key
            else:
                # the sweep artifact records which query forced each frame
                builder = next((q for t, q in builders.items()
                                if t.endswith(tag) or tag.endswith(t)), None)
            if not builder:
                print(f"  no builder known for {key}; cannot re-measure solo",
                      file=sys.stderr)
                continue
            print(f"  re-measuring {key} solo via {builder} ...",
                  file=sys.stderr)
            got = solo_measure(key, builder, sfdir, opts.get("warm-dir"))
            solo = None
            for k, v in got.items():
                if k == key or (tag and frame_tag(k) == tag):
                    solo = v if solo is None else min(solo, v)
            if solo is not None:
                r["solo_sec"] = solo
                r["solo_ratio"] = (solo / r["base_sec"]
                                   if r["base_sec"] > 0.05 else None)

    def floor_ratio(r):
        cands = [x for x in (r.get("ratio"), r.get("solo_ratio"))
                 if x is not None]
        return min(cands) if cands else None
    remaining = [r for r in rows
                 if r["base_sec"] > 0.2 and floor_ratio(r) is not None
                 and floor_ratio(r) > factor]

    print(f"{'entry':42s} {'base_s':>8s} {'soak_s':>8s} {'ratio':>7s} "
          f"{'solo_s':>8s} {'floor':>7s}")
    for r in rows:
        ratio = f"{r['ratio']:7.2f}" if r["ratio"] is not None else "    n/a"
        solo = f"{r['solo_sec']:8.2f}" if "solo_sec" in r else "       -"
        fl = floor_ratio(r)
        flr = f"{fl:7.2f}" if fl is not None else "    n/a"
        print(f"{r['key']:42s} {r['base_sec']:8.2f} {r['soak_sec']:8.2f} "
              f"{ratio} {solo} {flr}")
    artifact = {"factor": factor, "base": base_path, "soak": soak_path,
                "rows": rows,
                "alarms_pre_solo": [r["key"] for r in alarms],
                "alarms_post_solo": [r["key"] for r in remaining]}
    if opts.get("out"):
        json.dump(artifact, open(opts["out"], "w"), indent=1)
        print(f"\nartifact -> {opts['out']}")
    print()
    if remaining:
        print(f"SUPERLINEAR (> {factor:.0f}x after solo adjudication): "
              + ", ".join(f"{r['key']} ({floor_ratio(r):.1f}x)"
                          for r in remaining))
        sys.exit(1)
    if alarms:
        print(f"OK: {len(alarms)} in-sweep spike(s) adjudicated to under "
              f"{factor:.0f}x by solo re-measure "
              f"({', '.join(r['key'] for r in alarms)})")
    else:
        print(f"OK: no entry above {factor:.0f}x")


main()
