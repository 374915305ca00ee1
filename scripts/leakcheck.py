#!/usr/bin/env python3
"""Self-evidencing leak scan (builder-side).

The round-10 advisor flagged that the driver's LEAKCHECK.json carries no
commit SHA or timestamp, so a round bump is not self-evidencing. This
script runs the same category scan over the repo's tracked text files
and stamps WHAT was scanned: commit SHA, UTC timestamp, file count.

Usage: leakcheck.py [out-json]
"""
import json
import re
import subprocess
import sys
import time

PATTERNS = {
    "internal-import": r"import\s+(com\.anthropic|ant\.|anthropic\.)",
    "internal-url": r"https?://[a-z0-9.-]*\.(anthropic|ant)\.internal",
    "internal-pkg2": r"(claude-cli-internal|anthropics/)",
    "internal-bucket": r"(s3|gs)://(ant-|anthropic-)",
    "slack-link": r"#claude-code-|go/cc\b",
    "api-key": r"sk-ant-[A-Za-z0-9_-]{10,}",
    "axon-env": r"AXON_[A-Z_]+=",
}


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "LEAKCHECK_builder.json"
    sha = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                         text=True).stdout.strip()
    files = subprocess.run(["git", "ls-files"], capture_output=True,
                           text=True).stdout.splitlines()
    hits = {k: [] for k in PATTERNS}
    n_scanned = 0
    for f in files:
        if f == "scripts/leakcheck.py":
            continue  # the pattern definitions match themselves
        try:
            with open(f, "r", encoding="utf-8", errors="ignore") as fh:
                text = fh.read()
        except (OSError, IsADirectoryError):
            continue
        n_scanned += 1
        for cat, pat in PATTERNS.items():
            for m in re.finditer(pat, text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{f}:{line}")
    report = {
        "commit": sha,
        "timestamp_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "files_scanned": n_scanned,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"{out}: {report['n_hits']} hits over {n_scanned} files at {sha[:12]}")
    return 1 if report["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
