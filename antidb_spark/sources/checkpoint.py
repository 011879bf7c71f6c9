"""Resumable-build checkpoints, lineage, and build metrics (SURVEY M4).

Reference analog: ``idx()`` skips recompression when the ``.zst`` exists
and the whole index build when the ``.adb`` exists (idx.py:85-92) —
artifact-granularity resume. The north rule requires per-PARTITION
checkpoints: each build stage (and each partition group within the block
stage) writes a commit marker after its data is durable; a restarted
build skips committed units, so lost work is bounded by one unit even at
10^12-turn scale.

Lineage rows record (stage, unit, rows, seconds, snapshot) per committed
unit; metrics rows are phase wall-clock timings (the reference's
``count_exec_time`` decorator + perf JSON, idx.py:29-37,
from_readme_ann.py:92-109). Both are published as catalog tables at
finalize and also kept as JSON beside the markers so a crashed build
still exposes partial lineage.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class BuildCheckpoint:
    def __init__(self, root: str):
        self.dir = os.path.join(root, "_checkpoints")
        os.makedirs(self.dir, exist_ok=True)
        self._lineage_path = os.path.join(self.dir, "lineage.jsonl")

    def _marker(self, unit: str) -> str:
        return os.path.join(self.dir, f"{unit}.done")

    def is_done(self, unit: str) -> bool:
        return os.path.exists(self._marker(unit))

    def mark_done(self, unit: str, **lineage: Any) -> None:
        row = {"unit": unit, "committed_at": time.time(), **lineage}
        with open(self._lineage_path, "a") as f:
            f.write(json.dumps(row, default=str) + "\n")
        tmp = self._marker(unit) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(row, f, default=str)
        os.replace(tmp, self._marker(unit))

    def lineage_rows(self) -> list[dict]:
        if not os.path.exists(self._lineage_path):
            return []
        with open(self._lineage_path) as f:
            rows = [json.loads(line) for line in f if line.strip()]
        # last commit per unit wins (a unit may re-commit after reset)
        byunit: dict[str, dict] = {}
        for r in rows:
            byunit[r["unit"]] = r
        return list(byunit.values())

    def unmark(self, unit: str) -> None:
        """Invalidate one committed unit (e.g. an optional index layer a
        compaction made stale) without touching the others."""
        try:
            os.remove(self._marker(unit))
        except FileNotFoundError:
            pass

    def reset(self) -> None:
        import shutil

        shutil.rmtree(self.dir, ignore_errors=True)
        os.makedirs(self.dir, exist_ok=True)


class PhaseTimer:
    """count_exec_time analog (idx.py:29-37): wall-clock per build phase."""

    def __init__(self):
        self.phases: list[dict] = []

    def phase(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.time()
                return self

            def __exit__(self, *exc):
                timer.phases.append(
                    {"phase": name, "seconds": time.time() - self.t0,
                     "ok": exc[0] is None}
                )
                return False

        return _Ctx()
