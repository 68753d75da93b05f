#!/usr/bin/env python
"""Run the FULL test suite, one fresh interpreter per test module.

One documented command that runs all tests green in one invocation
(VERDICT r4 item 10). Background: a single in-process full-suite run
segfaulted inside XLA-CPU's backend_compile after ~45 minutes of
accumulated compiles (every involved test passes standalone — the crash
tracks accumulated compilation state, not any test). Per-module process
isolation caps the compile accumulation at one module's worth, which has
never crashed.

    python scripts/run_full_suite.py            # everything
    python scripts/run_full_suite.py -m 'not slow'   # fast tier only

Exit code 0 iff every module passed. Prints a per-module line and a
final summary. Extra args after the script name are forwarded to pytest
(e.g. -m/-k filters).
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    extra = sys.argv[1:]
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2
    t_start = time.time()
    failures: list[str] = []
    total_passed = 0
    total_skipped = 0
    for f in files:
        rel = os.path.relpath(f, REPO)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", rel, "-q", "--no-header",
             "-p", "no:cacheprovider", *extra],
            cwd=REPO, capture_output=True, text=True,
        )
        out = proc.stdout.strip().splitlines()
        tail = out[-1] if out else ""
        dt = time.time() - t0
        # pytest exit 5 = no tests collected (e.g. all deselected) — fine.
        ok = proc.returncode in (0, 5)
        mark = "ok  " if ok else "FAIL"
        print(f"{mark} {rel:45s} {dt:7.1f}s  {tail}", flush=True)
        if not ok:
            failures.append(rel)
            sys.stdout.write(proc.stdout[-4000:])
            sys.stdout.write(proc.stderr[-4000:])
        # crude counts from the summary line
        mp = re.search(r"(\d+) passed", tail)
        msk = re.search(r"(\d+) skipped", tail)
        total_passed += int(mp.group(1)) if mp else 0
        total_skipped += int(msk.group(1)) if msk else 0
    wall = time.time() - t_start
    print(
        f"\n{len(files)} modules, {total_passed} passed, "
        f"{total_skipped} skipped, {len(failures)} failed modules, "
        f"{wall/60:.1f} min total"
    )
    if failures:
        print("failed modules:", *failures, sep="\n  ")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
