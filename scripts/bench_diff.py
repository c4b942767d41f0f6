#!/usr/bin/env python3
"""Round-over-round bench adjudication, cpu/bytes FIRST (the round-12 rule):
compare two BENCH_DETAIL.json sidecars and classify each query's movement.

This box's wall jitters at host level while executor-CPU and shuffle bytes
stay flat on unchanged plans (rounds 10-12 evidence), so a wall move alone
is a BOX note, not a regression. Classes, checked in order:

  plan-change   shuffle bytes moved > 10%  (a plan property changed)
  cpu-change    cpu_s moved > 25% with bytes flat  (compute changed;
                note cpu_s itself inflates ~15% under SMT pressure)
  wall-only     wall_min moved > 20% with cpu and bytes flat  (box)
  flat          none of the above

Usage: bench_diff.py OLD_BENCH_DETAIL.json NEW_BENCH_DETAIL.json [--all]
Prints one line per non-flat query (every query with --all), then a summary.
"""
import json
import sys


def ratio(new, old):
    if old in (None, 0) or new is None:
        return None
    return new / old


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    show_all = "--all" in sys.argv
    if len(args) != 2:
        sys.exit(__doc__)
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))
    qs = sorted(set(old.get("queries_min", {})) & set(new.get("queries_min", {})))
    only_old = sorted(set(old.get("queries_min", {})) - set(qs))
    only_new = sorted(set(new.get("queries_min", {})) - set(qs))
    counts = {"plan-change": 0, "cpu-change": 0, "wall-only": 0, "flat": 0}
    print(f"{'query':26s} {'class':11s} {'wall':>6} {'cpu':>6} {'bytes':>6}")
    for q in qs:
        rw = ratio(new["queries_min"].get(q), old["queries_min"].get(q))
        rc = ratio(new.get("cpu_s", {}).get(q), old.get("cpu_s", {}).get(q))
        rb = ratio(new.get("shuffle_bytes", {}).get(q),
                   old.get("shuffle_bytes", {}).get(q))
        if rb is not None and abs(rb - 1) > 0.10:
            cls = "plan-change"
        elif rc is not None and abs(rc - 1) > 0.25:
            cls = "cpu-change"
        elif rw is not None and abs(rw - 1) > 0.20:
            cls = "wall-only"
        else:
            cls = "flat"
        counts[cls] += 1
        if cls != "flat" or show_all:
            def f(r):
                return f"{r:5.2f}x" if r is not None else "    ?"
            print(f"{q:26s} {cls:11s} {f(rw)} {f(rc)} {f(rb)}")
    print(f"\n{len(qs)} common queries: " +
          ", ".join(f"{k} {v}" for k, v in counts.items()))
    if only_old:
        print(f"dropped since old: {', '.join(only_old)}")
    if only_new:
        print(f"new since old: {', '.join(only_new)}")
    print("adjudicate plan-change by reading the plan, cpu-change against "
          "the cpu band (SMT inflates ~15%), wall-only as box noise unless "
          "it persists across idle runs.")


if __name__ == "__main__":
    main()
