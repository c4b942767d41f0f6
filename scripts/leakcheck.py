#!/usr/bin/env python3
"""Builder-side leak self-check: grep the repo's tracked sources for the
categories the driver's per-round leak detector gates on (proprietary or
internal-looking imports, URLs, package roots, bucket/env names, chat
links, credentials). Writes LEAKCHECK.json in the driver's shape
({round, n_hits, hits: {category: [...]}}) so close_round.py rule 5a can
gate locally between driver runs. The driver re-runs its own detector at
judge time — this is the round's self-check, labeled as such.

Usage: leakcheck.py [round]
"""
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CATEGORIES = {
    # non-public package roots / imports (the engine only uses org.apache.*,
    # scala*, java*, jdk.incubator.*, graft.*)
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache|scala|java|jdk\.incubator|graft)"
        r"(com|net|io|ai|co)\.[a-z]", re.M),
    "internal-url": re.compile(
        r"https?://(?!github\.com|issues\.apache|spark\.apache|arxiv\.org|"
        r"www\.w3|docs\.oracle|openjdk|duckdb|localhost|127\.0\.0\.1)"
        r"[a-z0-9.-]*\.(corp|internal|intra)[a-z0-9./-]*", re.I),
    "internal-pkg2": re.compile(r"\b(?:internal|corp)[-_.]only\b", re.I),
    "internal-bucket": re.compile(r"\b(?:s3|gs)://[a-z0-9._-]+", re.I),
    "slack-link": re.compile(r"slack\.com|go/[a-z][a-z0-9-]{1,30}\b|#[a-z]+-[a-z]+-(?:feedback|internal)"),
    "api-key": re.compile(r"\b(?:sk-[A-Za-z0-9]{16,}|AKIA[0-9A-Z]{16}|"
                          r"ghp_[A-Za-z0-9]{20,}|xox[bap]-)"),
    "axon-env": re.compile(r"\b[A-Z_]*(?:PROD|CORP|INTERNAL)_(?:URL|HOST|BUCKET|TOKEN)\b"),
}

SCAN_EXT = (".scala", ".java", ".py", ".md", ".sbt", ".sh", ".json")


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    files = subprocess.run(["git", "ls-files"], cwd=REPO, capture_output=True,
                           text=True).stdout.splitlines()
    hits = {k: [] for k in CATEGORIES}
    for f in files:
        if not f.endswith(SCAN_EXT) or f == "scripts/leakcheck.py":
            continue
        try:
            text = open(os.path.join(REPO, f), encoding="utf-8",
                        errors="replace").read()
        except OSError:
            continue
        for cat, rx in CATEGORIES.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{f}:{line}:{m.group(0)[:60]}")
    n = sum(len(v) for v in hits.values())
    out = {"round": rnd, "n_hits": n, "hits": hits}
    with open(os.path.join(REPO, "LEAKCHECK.json"), "w") as fh:
        json.dump(out, fh)
    print(f"LEAKCHECK: {n} hits" + ("" if n == 0 else f" — {hits}"))
    sys.exit(0 if n == 0 else 1)


if __name__ == "__main__":
    main()
