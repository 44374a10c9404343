#!/usr/bin/env python3
"""Self-evidencing leak scan: the repo-side twin of the driver's per-round
LEAKCHECK, emitting scan PROVENANCE (files scanned, timestamp, pattern
set version) alongside the hits so a clean result is auditable rather
than a bare zero (round-7 ADVICE item).

Usage: python3 tools/leakcheck.py [repo_root] > LEAKCHECK.json

Patterns are deliberately generic categories of non-public references: a
public open-source engine must contain none of them, whatever the
environment it was built in.
"""
import json
import os
import re
import sys
import time

PATTERNS_VERSION = 2
CATEGORIES = {
    # imports/usages of non-public python/scala namespaces
    "internal-import": re.compile(
        r"(?:import|from)\s+(?:com\.internal|internal_|corp[._])", re.I),
    # URLs that are not public internet hosts
    "internal-url": re.compile(
        r"https?://[\w.-]*(?:\.corp\.|\.internal\.|intranet)[\w./-]*", re.I),
    # private package registries / artifact coordinates
    "internal-pkg2": re.compile(
        r"(?:artifactory|nexus)[\w.-]*\.(?:corp|internal)", re.I),
    # cloud buckets that are not placeholders
    "internal-bucket": re.compile(
        r"(?:s3|gs)://(?!my-bucket|example|bucket/)[\w-]*(?:prod|internal|corp)[\w-]*", re.I),
    # chat/issue-tracker short links
    # "go/no-go" is ordinary engineering English, not a short link
    "slack-link": re.compile(r"(?:slack\.com/archives|\bgo/(?!no-go\b)[a-z][\w-]{2,})"),
    # credential-shaped strings
    "api-key": re.compile(
        r"(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|api[_-]?key\s*[:=]\s*['\"][A-Za-z0-9]{16,})"),
    # environment variables referencing non-public infra
    "axon-env": re.compile(r"\b[A-Z_]*(?:AXON|INTERNAL_ENDPOINT)[A-Z_]*\b"),
}

SCAN_EXT = {".scala", ".sbt", ".py", ".md", ".json", ".sql", ".conf",
            ".properties", ".txt"}
SKIP_DIRS = {"target", ".git", ".bloop", ".metals", "project"}


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    hits = {k: [] for k in CATEGORIES}
    n_files = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
        for fn in sorted(filenames):
            if os.path.splitext(fn)[1] not in SCAN_EXT:
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, root)
            if rel in ("LEAKCHECK.json", "tools/leakcheck.py"):
                continue  # the scanner and its output carry the patterns
            try:
                text = open(path, encoding="utf-8", errors="replace").read()
            except OSError:
                continue
            n_files += 1
            for lineno, line in enumerate(text.splitlines(), 1):
                for cat, rx in CATEGORIES.items():
                    if rx.search(line):
                        hits[cat].append(f"{rel}:{lineno}")
    out = {
        "round": int(os.environ.get("GRAFT_ROUND", "8")),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "scan": {
            "tool": f"tools/leakcheck.py v{PATTERNS_VERSION}",
            "n_files_scanned": n_files,
            "scan_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        },
    }
    json.dump(out, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
