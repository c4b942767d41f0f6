#!/usr/bin/env python3
"""Exponent table from a ScaleSweep JSON: per query, least-squares log-log
slope of cpu_s / shuffle_mb / wall_s against the scale factors encoded in the
cell labels (e.g. "sf0.1", "10x" — any label containing a number; relative
scale is number/smallest).

  python3 scripts/scaling_audit.py SCALING_AUDIT.json [--min-cpu 0.5] [--flag 1.3]

Flags a query when its cpu exponent exceeds --flag AND its largest-scale cpu
exceeds --min-cpu seconds (tiny absolute cpu at the top scale is noise, not a
scale bug). Shuffle exponents above --flag are reported too (shuffle should
track rows ~linearly; super-linear shuffle is a plan that re-exchanges more
than the data grew).
"""
import json
import re
import sys


def num(label):
    m = re.search(r"([0-9]*\.?[0-9]+)", label)
    return float(m.group(1)) if m else None


def slope(xs, ys):
    import math
    pts = [(math.log(x), math.log(y)) for x, y in zip(xs, ys) if y > 0]
    if len(pts) < 2:
        return None
    n = len(pts)
    sx = sum(p[0] for p in pts); sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts); sxy = sum(p[0] * p[1] for p in pts)
    d = n * sxx - sx * sx
    return (n * sxy - sx * sy) / d if d else None


def main():
    path = sys.argv[1]
    args = sys.argv[2:]
    min_cpu = float(args[args.index("--min-cpu") + 1]) if "--min-cpu" in args else 0.5
    flag_at = float(args[args.index("--flag") + 1]) if "--flag" in args else 1.3
    doc = json.load(open(path))
    flagged, errors = [], []
    print(f"{'query':28s} {'cpuExp':>7s} {'shufExp':>8s} {'topCpu':>7s} {'topShMB':>8s} note")
    for q, cells in sorted(doc["queries"].items()):
        scales, cpus, shs = [], [], []
        note = ""
        for label, rec in cells.items():
            if label == "warm_runs" or not isinstance(rec, dict):
                continue
            if "error" in rec:
                errors.append((q, label, rec["error"]))
                note = f"ERROR@{label}"
                continue
            s = num(label)
            if s is None:
                continue
            scales.append(s); cpus.append(rec.get("cpu_s", 0)); shs.append(rec.get("shuffle_mb", 0))
        if len(scales) < 2:
            print(f"{q:28s} {'-':>7s} {'-':>8s} {'-':>7s} {'-':>8s} {note or 'insufficient cells'}")
            continue
        base = min(scales)
        rel = [s / base for s in scales]
        ce = slope(rel, cpus)
        se = slope(rel, shs)
        top_cpu = cpus[scales.index(max(scales))]
        top_sh = shs[scales.index(max(scales))]
        bad = []
        if ce is not None and ce > flag_at and top_cpu >= min_cpu:
            bad.append(f"cpu^{ce:.2f}")
        if se is not None and se > flag_at and top_sh >= 8:
            bad.append(f"shuffle^{se:.2f}")
        if bad:
            flagged.append((q, ", ".join(bad)))
        print(f"{q:28s} {ce if ce is not None else float('nan'):7.2f} "
              f"{se if se is not None else float('nan'):8.2f} {top_cpu:7.2f} {top_sh:8.1f} "
              f"{note}{' <-- ' + ', '.join(bad) if bad else ''}")
    print()
    if errors:
        print("errors:")
        for q, label, e in errors:
            print(f"  {q} @ {label}: {e}")
    if flagged:
        print("flagged super-linear:")
        for q, why in flagged:
            print(f"  {q}: {why}")
        sys.exit(1)
    print("no super-linear scalers above the flag threshold")


if __name__ == "__main__":
    main()
