#!/usr/bin/env python3
"""Reconstruct/merge ScaleSweep JSON docs from sweep stderr logs and/or JSON
artifacts (a crashed sweep leaves only its per-cell stderr lines).

  python3 scripts/sweep_merge.py OUT.json IN1 [IN2 ...]

Each IN is either a ScaleSweep JSON artifact or a log containing
"[sweep] <query> @ <label> -> {cell json}" lines. Later inputs win on
(query, label) conflicts. The dirs list is merged as a union.
"""
import json
import re
import sys

LINE = re.compile(r"\[sweep\] (\S+) @ (\S+) -> (\{.*\})\s*$", re.MULTILINE)


def main():
    out_path, ins = sys.argv[1], sys.argv[2:]
    queries, dirs = {}, []
    for path in ins:
        text = open(path).read()
        try:
            doc = json.loads(text)
            for d in doc.get("dirs", []):
                if d not in dirs:
                    dirs.append(d)
            for q, cells in doc.get("queries", {}).items():
                queries.setdefault(q, {}).update(cells)
            continue
        except ValueError:
            pass
        for m in LINE.finditer(text):
            q, label, cell = m.group(1), m.group(2), m.group(3)
            try:
                queries.setdefault(q, {})[label] = json.loads(cell)
            except ValueError:
                pass
    doc = {"dirs": dirs, "queries": queries}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    n_err = sum(1 for c in queries.values()
                for v in c.values() if isinstance(v, dict) and "error" in v)
    print(f"{out_path}: {len(queries)} queries, {n_err} error cells")


if __name__ == "__main__":
    main()
