"""Structured per-frame metrics: JSONL log + summaries.

The reference's observability is `print` statements and a live matplotlib
scatter (sfm.py:324,373,401 — SURVEY.md §5). Here every frame emits a
structured record (inliers, reprojection error, track/point counts, BA
convergence, stage timings) to an append-only JSONL file that survives
crashes, plus an in-memory aggregate for end-of-run summaries.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.records: list[dict[str, Any]] = []
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            # truncate: one run per file
            open(path, "w").close()

    def log(self, **fields) -> dict[str, Any]:
        rec = {"ts": time.time(), **fields}
        self.records.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec

    def summary(self) -> dict[str, Any]:
        frames = [r for r in self.records if r.get("event") == "frame"]
        if not frames:
            return {"frames": 0}
        errs = [r["reproj_error"] for r in frames if "reproj_error" in r]
        times = [r["wall_s"] for r in frames if "wall_s" in r]
        return {
            "frames": len(frames),
            "mean_reproj_error": sum(errs) / max(len(errs), 1),
            "max_reproj_error": max(errs) if errs else None,
            "mean_frame_s": sum(times) / max(len(times), 1) if times else None,
            "frames_per_s": len(times) / sum(times) if times else None,
        }


class StageTimer:
    """Context-manager accumulator for per-stage wall times."""

    def __init__(self):
        self.stages: dict[str, float] = {}

    def stage(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.time()

            def __exit__(self, *exc):
                timer.stages[name] = timer.stages.get(name, 0.0) + time.time() - self.t0

        return _Ctx()
