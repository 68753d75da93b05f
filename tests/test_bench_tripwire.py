"""Bench-fps regression tripwire (fast tier).

Round 3 regressed the canonical bench number 24% and nothing caught it
until the judge did (VERDICT r3). Guards:

1. The newest BENCH_r*.json that carries the round-4 multi-rep
   methodology (a "reps" field: data-chained, value-distinct reps whose
   median is the steady-state number) must stay above a hard floor.
   Pre-methodology artifacts (r01-r03) measured the first pass through
   the loop — dominated by one-time dispatch warmup — and are exempt.
2. CLAUDE.md's recorded bench state must mention the same order of
   magnitude so docs can't silently drift from artifacts.
"""

import glob
import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Steady-state floor: measured 97-103 fps across three independent runs
# (2026-08-20); 60 leaves room for tunnel-load variance while still
# catching any repeat of a 46->35-class code regression.
FLOOR_FPS = 60.0


def _newest_bench():
    arts = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    return arts[-1] if arts else None


def test_latest_bench_artifact_above_floor():
    art = _newest_bench()
    assert art, "no BENCH_r*.json artifact found"
    with open(art) as fh:
        data = json.load(fh)
    parsed = data.get("parsed", data)
    reps = parsed.get("reps")
    if reps is None:
        pytest.skip(
            f"{os.path.basename(art)} predates the multi-rep methodology "
            "(single-pass numbers are dispatch-warmup-dominated)"
        )
    import statistics

    warm = reps[1:] if len(reps) > 2 else reps  # rep 0 = warmup pass
    median = statistics.median(warm)
    assert median >= FLOOR_FPS, (
        f"bench steady-state regressed: median warm rep {median:.1f} fps "
        f"< floor {FLOOR_FPS} fps ({os.path.basename(art)})"
    )


def test_claude_md_bench_state_is_current():
    """CLAUDE.md must describe the steady-state number's magnitude."""
    with open(os.path.join(ROOT, "CLAUDE.md")) as fh:
        text = fh.read()
    m = re.search(r"bench state[^:]*:\s*~?(\d+(?:\.\d+)?)\s*fps", text)
    assert m, "CLAUDE.md must carry a 'bench state: <N> fps' line"
    recorded = float(m.group(1))
    art = _newest_bench()
    if art is None:
        pytest.skip("no artifact to compare against")
    with open(art) as fh:
        data = json.load(fh)
    parsed = data.get("parsed", data)
    reps = parsed.get("reps")
    if reps is None:
        return  # pre-methodology artifact; doc may legitimately differ
    import statistics

    median = statistics.median(reps[1:] if len(reps) > 2 else reps)
    assert 0.5 * median <= recorded <= 2.0 * median, (
        f"CLAUDE.md records {recorded} fps but the newest artifact's "
        f"steady-state median is {median:.1f} fps — update the doc"
    )
