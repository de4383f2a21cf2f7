"""Structured per-stage timing + counters.

Replaces the reference's SAVE_TIMES chrono spans
(/root/reference/include/System.h:23; Tracking.cc:1557-1561 preint /
pose-pred / local-map-track / new-KF-decision accumulators,
LocalMapping.cc:92-285 per-stage t0..t8) with one reusable recorder that
keeps the SAME stage taxonomy so numbers are comparable against the
reference's instrumentation. Also the Verbose::PrintMess logger analog
(include/System.h:47-72) as a leveled module logger.

For kernel-level profiles use `jax.profiler.trace` around the jitted
steps; this module covers the host-visible pipeline stages.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict

# Stage names mirroring the reference's taxonomy.
STAGES = (
    "orb_extraction",       # Frame::mTimeORB_Ext
    "imu_preintegration",   # mTime_PreIntIMU
    "pose_prediction",      # mTime_PosePred
    "local_map_track",      # mTime_LocalMapTrack
    "new_kf_decision",      # mTime_NewKF_Dec
    "kf_insert",            # LocalMapping ProcessNewKeyFrame
    "triangulation",        # CreateNewMapPoints
    "fuse",                 # SearchInNeighbors
    "local_ba",             # LocalBundleAdjustment / LocalInertialBA
    "culling",              # MapPointCulling / KeyFrameCulling
    "loop_detect",          # NewDetectCommonRegions
    "loop_correct",         # CorrectLoop
)


@dataclass
class StageTimer:
    total_s: Dict[str, float] = field(
        default_factory=lambda: defaultdict(float))
    count: Dict[str, int] = field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total_s[name] += time.perf_counter() - t0
            self.count[name] += 1

    def mean_ms(self, name: str) -> float:
        c = self.count.get(name, 0)
        return 1e3 * self.total_s.get(name, 0.0) / c if c else 0.0

    def report(self) -> dict:
        return {
            name: {"mean_ms": round(self.mean_ms(name), 3),
                   "calls": self.count[name],
                   "total_s": round(self.total_s[name], 3)}
            for name in self.total_s
        }

    def summary(self) -> str:
        rows = sorted(self.total_s.items(), key=lambda kv: -kv[1])
        return "\n".join(
            f"{name:20s} {self.mean_ms(name):9.2f} ms/call "
            f"x{self.count[name]:5d}  total {self.total_s[name]:7.2f} s"
            for name, _ in rows
        )


# -- leveled logger (Verbose::PrintMess analog) ------------------------------

QUIET, NORMAL, VERBOSE, DEBUG = 0, 1, 2, 3
_level = QUIET


def set_verbosity(level: int):
    global _level
    _level = level


def log(level: int, msg: str):
    if level <= _level:
        print(msg, flush=True)
