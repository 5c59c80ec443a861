"""Status/trace file + wall-time instrumentation.

TPU-native counterpart of ``comm_status_mod.f90`` (update_status :56-70 —
"elapsed, rank, RSS-GB, tag" appended at every phase boundary) and the C++
backend's wall_time/get_mem_use2 (comm_system_backend.cpp:86-117). Python's
stdlib replaces the C++ here because the reference's native code is host
plumbing, not compute (SURVEY.md §2.12).
"""
from __future__ import annotations

import os
import time


def _rss_gb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return float(line.split()[1]) / 1024**2
    except OSError:
        pass
    return 0.0


class StatusFile:
    """Append-only trace of tagged checkpoints with elapsed time and RSS."""

    def __init__(self, path: str | None, rank: int = 0):
        self.path = path
        self.rank = rank
        self.t0 = time.time()
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            with open(path, "a") as f:
                f.write(f"# status restarted at {time.ctime()}\n")

    def update(self, tag: str):
        line = f"{time.time() - self.t0:12.3f} {self.rank:4d} {_rss_gb():8.3f} GB  {tag}\n"
        if self.path:
            with open(self.path, "a") as f:
                f.write(line)
        return line


class Timer:
    """Named wall-time accumulators (the reference's wall_time sections)."""

    def __init__(self):
        self.acc: dict[str, float] = {}
        self._start: dict[str, float] = {}

    def start(self, name: str):
        self._start[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        dt = time.perf_counter() - self._start.pop(name)
        self.acc[name] = self.acc.get(name, 0.0) + dt
        return dt

    def report(self) -> str:
        return "\n".join(f"  {k:<28s} {v:10.3f} s"
                         for k, v in sorted(self.acc.items()))
