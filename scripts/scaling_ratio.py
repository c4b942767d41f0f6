#!/usr/bin/env python3
"""Scaling-curve table: per-query wall(sfA)/wall(sfB) from two Bench JSON
lines (driver convention: one JSON object per file/stdout line).

  python3 scripts/scaling_ratio.py /tmp/bench_sf01.log /tmp/bench_sf1.log

Uses the per-query MIN (contention-resistant) when present, else the
median. Flags ratios above the superlinear threshold (default 12x for a
10x row-count step on local[32])."""
import json
import re
import sys

THRESHOLD = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0


def load(path):
    with open(path) as f:
        for line in f:
            m = re.search(r'\{"metric".*\}', line)
            if m:
                return json.loads(m.group(0))
    raise SystemExit(f"no bench JSON line in {path}")


a, b = load(sys.argv[1]), load(sys.argv[2])
qa = a.get("queries_min") or a["queries"]
qb = b.get("queries_min") or b["queries"]
print(f"{'query':28s} {'base':>8s} {'scaled':>8s} {'ratio':>7s}")
flagged = []
for q in sorted(qa):
    if q not in qb:
        continue
    r = qb[q] / qa[q] if qa[q] > 0 else float("inf")
    mark = " <-- superlinear" if r > THRESHOLD else ""
    if mark:
        flagged.append(q)
    print(f"{q:28s} {qa[q]:8.3f} {qb[q]:8.3f} {r:7.2f}{mark}")
print(f"\ncalibration base={a['calibration']} scaled={b['calibration']}")
print(f"totals: base={a['value']:.2f}s scaled={b['value']:.2f}s "
      f"ratio={b['value']/a['value']:.2f}")
print(f"flagged (> {THRESHOLD}x): {flagged or 'none'}")
