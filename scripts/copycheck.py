#!/usr/bin/env python3
"""Builder-side copy-similarity check: token-shingle Jaccard of every repo
main/test source against every file in the reference repo, mirroring the
driver's per-round copy detector (threshold 0.6). Writes COPYCHECK.json in
the driver's shape ({flagged: [...], error: null}) so close_round.py's rule
5b can gate on content when the driver's own artifact has been cleaned
between sessions. The driver re-runs its own detector at judge time — this
is the round's self-check, labeled as such.

Usage: copycheck.py [round] [threshold]
"""
import json
import os
import re
import sys

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOK = re.compile(r"[A-Za-z_][A-Za-z_0-9]*|[0-9]+")
K = 8


def shingles(path):
    try:
        with open(path, encoding="utf-8", errors="ignore") as f:
            toks = TOK.findall(f.read())
    except OSError:
        return set()
    return {tuple(toks[i:i + K]) for i in range(max(0, len(toks) - K + 1))}


def walk(root, exts):
    for dirpath, dirs, files in os.walk(root):
        dirs[:] = [d for d in dirs if d not in
                   {".git", "target", "node_modules", ".ipynb_checkpoints"}]
        for f in files:
            if os.path.splitext(f)[1] in exts:
                yield os.path.join(dirpath, f)


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.6
    ref_files = [(p, shingles(p)) for p in walk(
        REF, {".py", ".ipynb", ".md", ".cpp", ".cc", ".rs", ".go", ".java",
              ".scala", ".sql", ".txt"})]
    ref_files = [(p, s) for p, s in ref_files if s]
    flagged = []
    n = 0
    for src in walk(os.path.join(REPO, "src"), {".scala"}):
        n += 1
        ss = shingles(src)
        if not ss:
            continue
        for rp, rs in ref_files:
            inter = len(ss & rs)
            if not inter:
                continue
            sim = inter / min(len(ss), len(rs))
            if sim > thr:
                flagged.append({"file": os.path.relpath(src, REPO),
                                "reference": rp, "similarity": round(sim, 3)})
    out = {"round": rnd, "builder_run": True, "threshold": thr,
           "n_repo_files": n, "n_reference_files": len(ref_files),
           "flagged": flagged, "error": None}
    with open(os.path.join(REPO, "COPYCHECK.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"COPYCHECK.json: {n} repo files vs {len(ref_files)} reference "
          f"files, {len(flagged)} flagged at >{thr}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
