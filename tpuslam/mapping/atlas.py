"""Atlas: the multi-map container (elastic recovery).

Mirrors /root/reference/src/Atlas.cc + the loss-handling policy of
Tracking (SURVEY.md section 5.3): on long-term tracking loss the current
map is KEPT (if it earned >=10 keyframes) and a fresh active map is
started (`CreateMapInAtlas`, src/Tracking.cc:2658); small maps are
discarded (`ResetActiveMap`, :3995). Archived maps remain available for
later merge detection (MergeLocal — next round) and for trajectory
export.

Maps here are immutable snapshots (MapState NamedTuples), so archiving
is O(1) — no locks, no deep copies. Archived maps are re-joined to the
active session by `tpuslam.mapping.merge` when cross-map place
recognition fires (MergeLocal, src/LoopClosing.cc:1450).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import numpy as np

from tpuslam.mapping import mapstate


@dataclass
class ArchivedMap:
    ms: mapstate.MapState
    kf_slots: List[int]
    n_kf: int
    n_mp: int
    trajectory: List[np.ndarray]   # packed per-frame poses of its session
    n_loops: int = 0
    # Session frame index range [start, end) of this map — which entries
    # of the tracker's (global, ever-growing) per-frame trajectory were
    # produced while this map was active. Needed at merge time to
    # transform exactly those frames into the welded world frame.
    frame_range: tuple = (0, 0)
    # Verified Sim3 constraints accumulated during the session
    # (KeyFrame::AddLoopEdge analog) — re-joined into the merged
    # session's pose graphs.
    loop_edges: list = field(default_factory=list)
    imu_initialized: bool = False
    # Retrieval index of the archived session (device-resident unpacked
    # descriptor cache) — merge detection scores new keyframes against
    # it without re-unpacking the archived pool per query.
    db: object = None


@dataclass
class Atlas:
    """Holds archived maps; the ACTIVE map lives in the tracker."""

    maps: List[ArchivedMap] = field(default_factory=list)
    min_keyframes_to_keep: int = 10   # src/Tracking.cc:1891-1899

    def archive(self, am: ArchivedMap) -> bool:
        """Store a finished map if it is worth keeping. Returns True if
        kept (CreateMapInAtlas path) or False if discarded
        (ResetActiveMap path)."""
        if am.n_kf >= self.min_keyframes_to_keep:
            self.maps.append(am)
            return True
        return False

    @property
    def n_maps(self) -> int:
        return len(self.maps)

    def total_keyframes(self) -> int:
        return sum(m.n_kf for m in self.maps)
