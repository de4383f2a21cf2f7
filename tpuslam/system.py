"""Public session API — the `ORB_SLAM3::System` analog (L6).

Mirrors /root/reference/src/System.cc + include/System.h:101-186:
construction wires the tracker (+ future mapping/loop threads — here the
synchronous pipeline inside MonoTracker), `track_monocular/track_stereo`
route frames, localization-only mode freezes mapping, reset clears the
active map, shutdown finalizes, and trajectories export in TUM format
(SaveTrajectoryTUM/EuRoC: timestamp tx ty tz qx qy qz qw).

Also first-class here (designed-but-disabled in the reference,
System.cc:108-172 SaveAtlas/LoadAtlas): checkpoint/resume of the whole
map state to an .npz (the SoA arrays serialize trivially — no
boost::serialization pointer fixups).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from tpuslam.config import SLAMConfig
from tpuslam.geometry import lie
from tpuslam.mapping import mapstate
from tpuslam.tracking.tracker import FrameResult, MonoTracker


class System:
    """One SLAM session."""

    SENSORS = ("mono", "stereo", "rgbd", "imu_mono", "imu_stereo")

    def __init__(self, cfg: SLAMConfig):
        if cfg.sensor not in self.SENSORS:
            raise ValueError(f"unknown sensor mode {cfg.sensor!r}")
        if cfg.sensor not in ("mono", "imu_mono"):
            # Front-end pieces for stereo exist (frontend/stereo.py); the
            # full stereo tracker wiring lands next round.
            raise NotImplementedError(
                f"sensor mode {cfg.sensor!r} not wired into the tracker yet")
        self.cfg = cfg
        self.tracker = MonoTracker(cfg)
        self.timestamps: List[float] = []
        self.localization_only = False
        self._shutdown = False

    # -- frame routing (TrackMonocular, src/System.cc:375) ------------------

    def track_monocular(self, img: np.ndarray,
                        timestamp: Optional[float] = None) -> FrameResult:
        if self._shutdown:
            raise RuntimeError("system is shut down")
        ts = time.time() if timestamp is None else float(timestamp)
        self.timestamps.append(ts)
        if self.localization_only:
            # ActivateLocalizationMode (System.cc:383-434): track against
            # the frozen map, never spawn keyframes.
            prev = self.tracker._need_keyframe
            self.tracker._need_keyframe = lambda n: False
            try:
                return self.tracker.process(img)
            finally:
                self.tracker._need_keyframe = prev
        return self.tracker.process(img)

    def track_monocular_inertial(self, img: np.ndarray, imu,
                                 timestamp: Optional[float] = None
                                 ) -> FrameResult:
        """TrackMonocular with IMU (imu = (gyro (S,3), acc (S,3), dt (S,))
        samples since the previous frame)."""
        if self._shutdown:
            raise RuntimeError("system is shut down")
        ts = time.time() if timestamp is None else float(timestamp)
        self.timestamps.append(ts)
        return self.tracker.process(img, imu=imu)

    # -- modes / lifecycle ---------------------------------------------------

    def activate_localization_mode(self):
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False

    def reset(self):
        """Reset the active map (System::Reset -> Tracking::Reset)."""
        cfg = self.cfg
        self.tracker = MonoTracker(cfg)
        self.timestamps = []

    def shutdown(self):
        self._shutdown = True

    # -- introspection (System.h:176-178) ------------------------------------

    def tracking_state(self) -> str:
        return self.tracker.state

    def map_stats(self) -> dict:
        ms = self.tracker.ms
        return {
            "keyframes": int(ms.kf_valid.sum()),
            "map_points": int(ms.mp_valid.sum()),
            "loops_closed": self.tracker.n_loops_closed,
        }

    # -- trajectory export (SaveTrajectoryTUM/EuRoC, System.cc:623) ----------

    def trajectory_tum(self) -> str:
        """TUM format: timestamp tx ty tz qx qy qz qw (world-frame camera
        position + world-from-camera quaternion)."""
        lines = []
        for ts, packed in zip(self.timestamps, self.tracker.trajectory):
            R_cw = packed[:9].reshape(3, 3)
            t_cw = packed[9:]
            c = -R_cw.T @ t_cw
            q = np.asarray(lie.rotmat_to_quat(jnp.asarray(R_cw.T)))
            lines.append(
                f"{ts:.6f} {c[0]:.7f} {c[1]:.7f} {c[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}"
            )
        return "\n".join(lines) + "\n"

    def save_trajectory(self, path):
        Path(path).write_text(self.trajectory_tum())

    def save_keyframe_trajectory(self, path):
        ms = self.tracker.ms
        lines = []
        for slot in self.tracker.kf_slots:
            R_cw = np.asarray(ms.kf_R[slot])
            t_cw = np.asarray(ms.kf_t[slot])
            c = -R_cw.T @ t_cw
            q = np.asarray(lie.rotmat_to_quat(jnp.asarray(R_cw.T)))
            lines.append(
                f"{slot} {c[0]:.7f} {c[1]:.7f} {c[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}"
            )
        Path(path).write_text("\n".join(lines) + "\n")

    # -- checkpoint / resume (SaveAtlas/LoadAtlas, first-class here) ---------

    def save_atlas(self, path):
        """Serialize the full map state + session counters to .npz."""
        ms = self.tracker.ms
        arrays = {f"ms_{k}": np.asarray(v) for k, v in ms._asdict().items()}
        np.savez_compressed(
            Path(path),
            **arrays,
            n_kf=self.tracker.n_kf,
            n_mp=self.tracker.n_mp,
            kf_slots=np.asarray(self.tracker.kf_slots, np.int32),
            last_R=self.tracker.last_R,
            last_t=self.tracker.last_t,
            state=self.tracker.state,
        )

    def load_atlas(self, path):
        """Restore map state; the session continues in localization-ready
        LOST state (relocalization re-acquires the pose, like the
        reference after LoadAtlas)."""
        data = np.load(Path(path), allow_pickle=False)
        fields = {k[3:]: jnp.asarray(data[k]) for k in data.files
                  if k.startswith("ms_")}
        self.tracker.ms = mapstate.MapState(**fields)
        self.tracker.n_kf = int(data["n_kf"])
        self.tracker.n_mp = int(data["n_mp"])
        self.tracker.kf_slots = [int(x) for x in data["kf_slots"]]
        self.tracker.last_R = data["last_R"]
        self.tracker.last_t = data["last_t"]
        self.tracker.state = "LOST"  # relocalize to re-acquire
        # Rebuild the retrieval index over restored keyframes.
        from tpuslam.tracking import loop_closing
        self.tracker.loop = loop_closing.LoopState.create(
            self.cfg.map.max_keyframes)
        for slot in self.tracker.kf_slots:
            loop_closing.on_new_keyframe(self.tracker.loop,
                                         self.tracker.ms, slot)
