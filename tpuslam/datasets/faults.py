"""Deterministic fault injection for robustness testing.

SURVEY.md section 5.3: the reference HAS failure-handling machinery
(RECENTLY_LOST/LOST state machine, Atlas recovery, timestamp-jump
guards, bad-IMU reset) but no way to TRIGGER those paths
deterministically. These wrappers corrupt a frame/IMU stream on
schedule so every recovery path gets exercised in tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional

import numpy as np


@dataclass
class FaultSchedule:
    """Which frame indices get which fault."""

    drop_frames: frozenset = frozenset()       # blank the image
    blur_frames: frozenset = frozenset()       # heavy motion blur
    noise_frames: frozenset = frozenset()      # strong sensor noise
    drop_imu_windows: frozenset = frozenset()  # lose the IMU between frames
    seed: int = 0

    @staticmethod
    def blackout(start: int, length: int) -> "FaultSchedule":
        return FaultSchedule(
            drop_frames=frozenset(range(start, start + length)))


def apply_frame_fault(img: np.ndarray, idx: int,
                      sched: FaultSchedule) -> np.ndarray:
    if idx in sched.drop_frames:
        return np.full_like(img, float(np.median(img)))
    if idx in sched.blur_frames:
        out = img
        for _ in range(12):  # wide box blur ~ strong motion blur
            out = 0.25 * (np.roll(out, 2, 1) + np.roll(out, -2, 1)
                          + 2 * out)
        return out.astype(img.dtype)
    if idx in sched.noise_frames:
        rng = np.random.default_rng(sched.seed + idx)
        return np.clip(
            img + rng.normal(0, 40, img.shape), 0, 255
        ).astype(img.dtype)
    return img


def apply_imu_fault(gyro, acc, window_idx: int, sched: FaultSchedule):
    """Returns (gyro, acc, valid_mask) with the window dropped if
    scheduled (exercises the masked-preintegration path)."""
    n = gyro.shape[0]
    if window_idx in sched.drop_imu_windows:
        return gyro, acc, np.zeros(n, bool)
    return gyro, acc, np.ones(n, bool)
