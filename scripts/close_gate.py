#!/usr/bin/env python3
"""Round-close artifact-ordering gate (VERDICT r15 ask #4).

Round 14's last feature (v52) landed AFTER the round-close artifacts
commit, so the newest gated query had no PLANLINT entry. This gate
makes that ordering slip mechanical to catch: run it at the intended
close HEAD, after features are frozen and the close artifacts are
regenerated. It checks

  1. PLANLINT_r{N}.json exists, says ok=true, and its `checked` count
     equals the gated-query registry count (the `Q("` entries under
     src/main/scala/graft/queries/) — a query landing after the lint
     leaves exactly the v52-style gap;
  2. BENCH_r{N}.json (the builder's close-HEAD run; the driver later
     overwrites it with its own) and BENCH_AB_r{N}.json (the
     same-build drift bracket) exist next to it;
  3. the git working tree is clean (the artifacts describe a commit,
     not a dirty tree).

Usage: scripts/close_gate.py <round-number>   (run from the repo root)
Exits non-zero with a diagnostic on any violation.
"""
import glob
import json
import os
import re
import subprocess
import sys


def fail(msg: str) -> None:
    print(f"CLOSE GATE FAIL: {msg}")
    sys.exit(1)


def main() -> None:
    if len(sys.argv) != 2:
        fail("usage: scripts/close_gate.py <round-number>")
    rnd = int(sys.argv[1])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    planlint = os.path.join(root, f"PLANLINT_r{rnd}.json")
    if not os.path.exists(planlint):
        fail(f"{planlint} missing — regenerate the plan lint at this HEAD")
    lint = json.load(open(planlint))
    if not lint.get("ok", False):
        fail(f"PLANLINT_r{rnd}.json records violations (ok=false)")

    registry = 0
    for path in glob.glob(
            os.path.join(root, "src/main/scala/graft/queries/*.scala")):
        registry += len(re.findall(r'Q\("', open(path).read()))
    if lint.get("checked") != registry:
        fail(f"PLANLINT checked {lint.get('checked')} plans but the "
             f"registry holds {registry} Q(\"…\") entries — a query "
             f"landed after the lint ran; regenerate PLANLINT_r{rnd} "
             f"at the close HEAD")

    for name in (f"BENCH_r{rnd}.json", f"BENCH_AB_r{rnd}.json"):
        if not os.path.exists(os.path.join(root, name)):
            fail(f"{name} missing — record the bench at the close HEAD")

    dirty = subprocess.run(["git", "status", "--porcelain"], cwd=root,
                           capture_output=True, text=True).stdout.strip()
    if dirty:
        fail("working tree not clean — commit (or drop) these before "
             "closing:\n" + dirty)

    print(f"CLOSE GATE OK: PLANLINT_r{rnd} covers all {registry} "
          f"registry queries, BENCH_r{rnd} present, tree clean")


if __name__ == "__main__":
    main()
