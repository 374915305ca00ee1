#!/usr/bin/env python3
"""One-shot mechanical rewrite: route every .localCheckpoint(...) call in
src/main through the graft.engine.Pin seam (.pinned / .pinnedLazy) and add
the PinOps import where missing. Pin.scala itself is the seam and is skipped.
"""
import re
import sys
from pathlib import Path

ROOT = Path("src/main/scala/graft")
SEAM = ROOT / "engine" / "Pin.scala"

changed = []
for f in sorted(ROOT.rglob("*.scala")):
    if f == SEAM:
        continue
    text = f.read_text()
    new = text.replace(".localCheckpoint(true)", ".pinned")
    new = new.replace(".localCheckpoint(false)", ".pinnedLazy")
    if new == text:
        continue
    if "import graft.engine.Pin.PinOps" not in new:
        lines = new.split("\n")
        # insert after the last top-of-file import line
        last_import = max(i for i, l in enumerate(lines) if l.startswith("import "))
        lines.insert(last_import + 1, "import graft.engine.Pin.PinOps")
        new = "\n".join(lines)
    f.write_text(new)
    changed.append(str(f))

print(f"rewrote {len(changed)} files")
for c in changed:
    print(" ", c)
leftover = []
for f in sorted(ROOT.rglob("*.scala")):
    if f == SEAM:
        continue
    for i, l in enumerate(f.read_text().split("\n"), 1):
        if re.search(r"\.localCheckpoint\(", l):
            leftover.append(f"{f}:{i}:{l.strip()}")
if leftover:
    print("LEFTOVER DIRECT CALLS:")
    print("\n".join(leftover))
    sys.exit(1)
print("zero direct localCheckpoint calls outside the seam")
