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
        if (cfg.sensor in ("stereo", "rgbd", "imu_stereo")
                and cfg.camera.bf <= 0):
            raise ValueError("stereo/rgbd/imu_stereo requires camera.bf > 0")
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
        return self.tracker.process(img, ts=ts)

    def track_stereo(self, img_left: np.ndarray, img_right: np.ndarray,
                     timestamp: Optional[float] = None) -> FrameResult:
        """TrackStereo (src/System.cc:262): rectified left/right pair."""
        if self._shutdown:
            raise RuntimeError("system is shut down")
        ts = time.time() if timestamp is None else float(timestamp)
        self.timestamps.append(ts)
        return self.tracker.process(img_left, img_right=img_right,
                                    ts=ts)

    def track_rgbd(self, img: np.ndarray, depth: np.ndarray,
                   timestamp: Optional[float] = None) -> FrameResult:
        """TrackRGBD (src/System.cc:318): gray image + metric depth map."""
        if self._shutdown:
            raise RuntimeError("system is shut down")
        ts = time.time() if timestamp is None else float(timestamp)
        self.timestamps.append(ts)
        return self.tracker.process(img, depth=depth, ts=ts)

    def track_monocular_inertial(self, img: np.ndarray, imu,
                                 timestamp: Optional[float] = None
                                 ) -> FrameResult:
        """TrackMonocular with IMU (imu = (gyro (S,3), acc (S,3), dt (S,))
        samples since the previous frame)."""
        if self._shutdown:
            raise RuntimeError("system is shut down")
        ts = time.time() if timestamp is None else float(timestamp)
        self.timestamps.append(ts)
        return self.tracker.process(img, imu=imu, ts=ts)

    def track_stereo_inertial(self, img_left: np.ndarray,
                              img_right: np.ndarray, imu,
                              timestamp: Optional[float] = None
                              ) -> FrameResult:
        """TrackStereo with IMU (the reference's IMU_STEREO grab path,
        src/Tracking.cc:983 + GrabImuData :1202): rectified left/right
        pair plus the (gyro (S,3), acc (S,3), dt (S,)) samples since the
        previous frame."""
        if self._shutdown:
            raise RuntimeError("system is shut down")
        ts = time.time() if timestamp is None else float(timestamp)
        self.timestamps.append(ts)
        return self.tracker.process(img_left, img_right=img_right,
                                    imu=imu, ts=ts)

    # -- modes / lifecycle ---------------------------------------------------

    def activate_localization_mode(self):
        """ActivateLocalizationMode (System.cc:383-434): track against the
        frozen map — no keyframes, no point-stat updates, no culling, no
        loss-triggered map archival."""
        self.localization_only = True
        self.tracker.frozen = True

    def deactivate_localization_mode(self):
        self.localization_only = False
        self.tracker.frozen = False

    def reset(self):
        """Reset the active map (System::Reset -> Tracking::Reset)."""
        cfg = self.cfg
        self.tracker = MonoTracker(cfg)
        self.timestamps = []

    def change_dataset(self):
        """Multi-sequence sessions (System::ChangeDataset, called between
        sequences by the example mains, e.g.
        /root/reference/Examples/Monocular/mono_euroc.cc:139): archive
        the active map into the Atlas and start a fresh one; later place
        recognition may weld the sessions back together (the multi-
        session EuRoC experiments)."""
        self.tracker.flush()
        self.tracker._new_map_in_atlas()

    def shutdown(self):
        self.tracker.flush()
        self._shutdown = True

    # -- introspection (System.h:176-178) ------------------------------------

    def tracking_state(self) -> str:
        # Summary API: drain in-flight pipelined frames first so the
        # reported state matches the frames already fed (tracker.flush
        # docstring contract).
        self.tracker.flush()
        return self.tracker.state

    def map_stats(self) -> dict:
        self.tracker.flush()
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
        for ts, packed in zip(self.timestamps,
                              self.tracker.packed_trajectory()):
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
        """SaveKeyFrameTrajectoryEuRoC (/root/reference/src/System.cc:746):
        TUM-format lines `timestamp tx ty tz qx qy qz qw` per keyframe —
        the keyframe's frame timestamp, so the output feeds standard
        evaluation tools (evaluate_ate_scale.py / evo). Sessions run
        without timestamps fall back to the slot index."""
        ms = self.tracker.ms
        lines = []
        for slot in self.tracker.kf_slots:
            R_cw = np.asarray(ms.kf_R[slot])
            t_cw = np.asarray(ms.kf_t[slot])
            c = -R_cw.T @ t_cw
            q = np.asarray(lie.rotmat_to_quat(jnp.asarray(R_cw.T)))
            ts = self.tracker.kf_ts.get(slot)
            ts = float(ts) if ts is not None else float(slot)
            lines.append(
                f"{ts:.6f} {c[0]:.7f} {c[1]:.7f} {c[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}"
            )
        Path(path).write_text("\n".join(lines) + "\n")

    def trajectory_kitti(self) -> str:
        """KITTI format (SaveTrajectoryKITTI, /root/reference/src/
        System.cc:798): one line per frame, the 3x4 world-from-camera
        matrix [R_wc | c] row-major — no timestamps (KITTI sequences are
        index-aligned)."""
        lines = []
        for packed in self.tracker.packed_trajectory():
            R_cw = packed[:9].reshape(3, 3)
            t_cw = packed[9:]
            R_wc = R_cw.T
            c = -R_wc @ t_cw
            m = np.concatenate([R_wc, c[:, None]], axis=1).reshape(-1)
            lines.append(" ".join(f"{v:.9e}" for v in m))
        return "\n".join(lines) + "\n"

    def save_trajectory_kitti(self, path):
        Path(path).write_text(self.trajectory_kitti())

    # -- checkpoint / resume (SaveAtlas/LoadAtlas, first-class here) ---------

    def save_atlas(self, path):
        """Serialize the full map state + session counters to .npz.

        Inertial sessions additionally round-trip biases, velocities,
        the IMU-init flag, and the slot-keyed keyframe preintegration
        chain (PreintState leaves stacked into arrays) — the reference's
        boost-serialized IMU members (include/ImuTypes.h:61-72)."""
        tr = self.tracker
        tr.flush()
        arrays = {f"ms_{k}": np.asarray(v) for k, v in tr.ms._asdict().items()}
        inertial = {}
        if self.cfg.sensor in ("imu_mono", "imu_stereo"):
            inertial = {
                "imu_bg": np.asarray(tr.bg),
                "imu_ba": np.asarray(tr.ba),
                "imu_vel": np.asarray(tr.vel),
                "imu_initialized": np.asarray(tr.imu_initialized),
            }
            pre_slots = sorted(tr.kf_preint)
            if pre_slots:
                stacked = [np.stack([np.asarray(getattr(tr.kf_preint[s], f))
                                     for s in pre_slots])
                           for f in tr.kf_preint[pre_slots[0]]._fields]
                inertial["preint_slots"] = np.asarray(pre_slots, np.int32)
                inertial.update({f"preint_{f}": a for f, a in zip(
                    tr.kf_preint[pre_slots[0]]._fields, stacked)})
            vel_slots = sorted(s for s, v in tr.kf_vel.items()
                               if v is not None)
            if vel_slots:
                inertial["kfvel_slots"] = np.asarray(vel_slots, np.int32)
                inertial["kfvel"] = np.stack(
                    [np.asarray(tr.kf_vel[s]) for s in vel_slots])
        np.savez_compressed(
            Path(path),
            **arrays,
            **inertial,
            n_kf=tr.n_kf,
            n_mp=tr.n_mp,
            kf_slots=np.asarray(tr.kf_slots, np.int32),
            last_R=tr.last_R,
            last_t=tr.last_t,
            state=tr.state,
        )

    def load_atlas(self, path):
        """Restore map state; the session continues in localization-ready
        LOST state (relocalization re-acquires the pose, like the
        reference after LoadAtlas)."""
        from tpuslam.imu import preintegration as pre

        data = np.load(Path(path), allow_pickle=False)
        tr = self.tracker
        tr._inflight = []             # drop any in-flight frame and
        tr._deferred = []             # deferred superstep commits
        tr._carry_valid = False
        tr._superstep_busy = False
        fields = {k[3:]: jnp.asarray(data[k]) for k in data.files
                  if k.startswith("ms_")}
        if "kf_ur" not in fields:  # checkpoints from before stereo obs
            fields["kf_ur"] = jnp.full(fields["kf_level"].shape, -1.0,
                                       jnp.float32)
        if "kf_uvr" not in fields:  # pre right-camera (fisheye) obs
            fields["kf_uvr"] = jnp.full(
                fields["kf_level"].shape + (2,), -1.0, jnp.float32)
        tr.ms = mapstate.MapState(**fields)
        tr._invalidate_kf_set()
        tr.n_kf = int(data["n_kf"])
        tr.n_mp = int(data["n_mp"])
        tr.kf_slots = [int(x) for x in data["kf_slots"]]
        tr.last_R = data["last_R"]
        tr.last_t = data["last_t"]
        if (self.cfg.sensor in ("imu_mono", "imu_stereo")
                and "imu_bg" in data.files):
            tr.bg = data["imu_bg"]
            tr.ba = data["imu_ba"]
            tr.vel = data["imu_vel"]
            tr.imu_initialized = bool(data["imu_initialized"])
            tr.kf_preint = {}
            if "preint_slots" in data.files:
                for i, s in enumerate(data["preint_slots"]):
                    tr.kf_preint[int(s)] = pre.PreintState(*[
                        jnp.asarray(data[f"preint_{f}"][i])
                        for f in pre.PreintState._fields])
            tr.kf_vel = {}
            if "kfvel_slots" in data.files:
                for i, s in enumerate(data["kfvel_slots"]):
                    tr.kf_vel[int(s)] = data["kfvel"][i]
            tr.cur_preint = pre.init_state(jnp.asarray(tr.bg),
                                           jnp.asarray(tr.ba))
        tr.state = "LOST"  # relocalize to re-acquire
        # Rebuild the retrieval index over restored keyframes.
        from tpuslam.tracking import loop_closing
        tr.loop = loop_closing.LoopState.create(self.cfg.map.max_keyframes)
        for slot in tr.kf_slots:
            loop_closing.on_new_keyframe(tr.loop, tr.ms, slot)
