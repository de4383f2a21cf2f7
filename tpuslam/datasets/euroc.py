"""EuRoC MAV dataset loader (ASL format).

Replaces the per-example `LoadImages`/`LoadIMU` loops of
/root/reference/Examples/Monocular/mono_euroc.cc:35 and
Monocular-Inertial/mono_inertial_euroc.cc: reads `mav0/camX/data.csv`
(timestamp_ns, filename), `mav0/imu0/data.csv` (timestamp_ns, gyro xyz,
acc xyz), and `mav0/state_groundtruth_estimate0/data.csv` for ATE
evaluation, associates IMU windows to frame intervals, and streams
grayscale frames.

No EuRoC data ships in this container; the loader is exercised by a
round-trip test on a miniature generated dataset in the same layout.
"""

from __future__ import annotations

import csv
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from tpuslam.config import CameraConfig, IMUConfig, ORBConfig, SLAMConfig


def euroc_camera_config() -> CameraConfig:
    """cam0 intrinsics of the EuRoC MAV (Examples/Monocular/EuRoC.yaml)."""
    return CameraConfig(
        width=752, height=480,
        fx=458.654, fy=457.296, cx=367.215, cy=248.375,
        dist=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05),
        fps=20.0,
        bf=47.90639384423901,  # stereo preset (Examples/Stereo/EuRoC.yaml)
    )


# Body-from-camera extrinsics Tbc of cam0 (Examples/Monocular-Inertial/
# EuRoC.yaml:30-38).
EUROC_TBC = (
    0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975,
    0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768,
    -0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949,
    0.0, 0.0, 0.0, 1.0,
)


def euroc_config(sensor: str = "mono") -> SLAMConfig:
    return SLAMConfig(
        camera=euroc_camera_config(),
        orb=ORBConfig(n_features=1024),
        imu=IMUConfig(freq=200.0, noise_gyro=1.7e-4, noise_acc=2.0e-3,
                      walk_gyro=1.9e-5, walk_acc=3.0e-3,
                      Tbc=EUROC_TBC),
        sensor=sensor,
    )


@dataclass
class EuRoCSequence:
    root: Path
    cam: str = "cam0"

    def __post_init__(self):
        self.root = Path(self.root)
        self.frames = self._read_cam_csv(self.root / "mav0" / self.cam
                                         / "data.csv")
        imu_csv = self.root / "mav0" / "imu0" / "data.csv"
        self.imu = self._read_imu_csv(imu_csv) if imu_csv.exists() else None
        gt_csv = (self.root / "mav0" / "state_groundtruth_estimate0"
                  / "data.csv")
        self.ground_truth = (self._read_gt_csv(gt_csv)
                             if gt_csv.exists() else None)

    # -- csv readers ---------------------------------------------------------

    @staticmethod
    def _read_cam_csv(path: Path) -> List[Tuple[float, str]]:
        out = []
        with open(path) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                out.append((int(row[0]) * 1e-9, row[1].strip()))
        return out

    @staticmethod
    def _read_imu_csv(path: Path):
        ts, gyro, acc = [], [], []
        with open(path) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                ts.append(int(row[0]) * 1e-9)
                gyro.append([float(v) for v in row[1:4]])
                acc.append([float(v) for v in row[4:7]])
        return {
            "t": np.asarray(ts),
            "gyro": np.asarray(gyro, np.float32),
            "acc": np.asarray(acc, np.float32),
        }

    @staticmethod
    def _read_gt_csv(path: Path):
        ts, pos = [], []
        with open(path) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                ts.append(int(row[0]) * 1e-9)
                pos.append([float(v) for v in row[1:4]])
        return {"t": np.asarray(ts), "pos": np.asarray(pos, np.float64)}

    # -- access --------------------------------------------------------------

    def __len__(self) -> int:
        return len(self.frames)

    def timestamp(self, i: int) -> float:
        return self.frames[i][0]

    def image(self, i: int) -> np.ndarray:
        """Grayscale float32 (H,W) in [0,255]."""
        from PIL import Image

        ts, name = self.frames[i]
        path = self.root / "mav0" / self.cam / "data" / name
        img = np.asarray(Image.open(path).convert("L"), np.float32)
        return img

    def imu_between(self, i: int, j: int):
        """IMU samples with frame_i <= t < frame_j (PreintegrateIMU's
        queue-draining, src/Tracking.cc:1217). Returns (gyro, acc, dt)."""
        if self.imu is None:
            return None
        t0, t1 = self.timestamp(i), self.timestamp(j)
        sel = (self.imu["t"] >= t0) & (self.imu["t"] < t1)
        idx = np.nonzero(sel)[0]
        if idx.size == 0:
            return None
        t = self.imu["t"][idx]
        dt = np.diff(np.append(t, t1)).astype(np.float32)
        return self.imu["gyro"][idx], self.imu["acc"][idx], dt

    def gt_positions_at(self, timestamps) -> Optional[np.ndarray]:
        """Ground-truth positions interpolated at the given times
        (associate.py's timestamp association, evaluation/associate.py)."""
        if self.ground_truth is None:
            return None
        gt_t = self.ground_truth["t"]
        gt_p = self.ground_truth["pos"]
        out = np.stack([
            np.interp(timestamps, gt_t, gt_p[:, k]) for k in range(3)
        ], axis=1)
        return out


def write_mini_sequence(root: Path, images: List[np.ndarray],
                        timestamps: List[float],
                        imu: Optional[dict] = None,
                        gt: Optional[np.ndarray] = None):
    """Write a miniature dataset in the EuRoC ASL layout (test fixture)."""
    from PIL import Image

    root = Path(root)
    cam = root / "mav0" / "cam0"
    (cam / "data").mkdir(parents=True, exist_ok=True)
    with open(cam / "data.csv", "w") as f:
        f.write("#timestamp [ns],filename\n")
        for ts, img in zip(timestamps, images):
            name = f"{int(ts * 1e9)}.png"
            Image.fromarray(img.astype(np.uint8)).save(cam / "data" / name)
            f.write(f"{int(ts * 1e9)},{name}\n")
    if imu is not None:
        imud = root / "mav0" / "imu0"
        imud.mkdir(parents=True, exist_ok=True)
        with open(imud / "data.csv", "w") as f:
            f.write("#timestamp,wx,wy,wz,ax,ay,az\n")
            for t, g, a in zip(imu["t"], imu["gyro"], imu["acc"]):
                f.write(f"{int(t * 1e9)},{g[0]},{g[1]},{g[2]},"
                        f"{a[0]},{a[1]},{a[2]}\n")
    if gt is not None:
        gtd = root / "mav0" / "state_groundtruth_estimate0"
        gtd.mkdir(parents=True, exist_ok=True)
        with open(gtd / "data.csv", "w") as f:
            f.write("#timestamp,px,py,pz\n")
            for ts, p in zip(timestamps, gt):
                f.write(f"{int(ts * 1e9)},{p[0]},{p[1]},{p[2]}\n")


def run_sequence(seq: EuRoCSequence, cfg: Optional[SLAMConfig] = None,
                 max_frames: Optional[int] = None, quiet: bool = True,
                 seq_right: Optional[EuRoCSequence] = None):
    """The per-sensor example mains' loop (mono_euroc.cc /
    mono_inertial_euroc.cc / stereo_euroc.cc / stereo_inertial_euroc.cc):
    stream frames (+ IMU windows, + right images) through a System
    according to cfg.sensor; return (system, ate_result_or_None).

    `seq_right`: cam1 stream for the stereo modes (defaults to the same
    root with cam="cam1")."""
    from tpuslam.eval import ate as ate_mod
    from tpuslam.system import System

    cfg = cfg or euroc_config()
    sysm = System(cfg)
    sensor = cfg.sensor
    use_imu = sensor in ("imu_mono", "imu_stereo")
    use_right = sensor in ("stereo", "imu_stereo")
    if use_imu and seq.imu is None:
        raise ValueError(f"{sensor} needs mav0/imu0/data.csv in {seq.root}")
    if use_right and seq_right is None:
        seq_right = EuRoCSequence(seq.root, cam="cam1")
    n = len(seq) if max_frames is None else min(len(seq), max_frames)
    # Native decode-ahead when built (native/loader.cpp): PNG inflation
    # runs in C++ worker threads and overlaps the device compute of the
    # previous frames; PrefetchingLoader falls back to PIL otherwise.
    from tpuslam.datasets.native_loader import PrefetchingLoader
    paths = [seq.root / "mav0" / seq.cam / "data" / seq.frames[i][1]
             for i in range(n)]
    rpaths = ([seq_right.root / "mav0" / seq_right.cam / "data"
               / seq_right.frames[i][1] for i in range(n)]
              if use_right else [])
    with PrefetchingLoader(paths + rpaths, cfg.camera.width,
                           cfg.camera.height) as ld:
        for i in range(n):
            ts = seq.timestamp(i)
            imu = seq.imu_between(i - 1, i) if (use_imu and i > 0) else None
            if sensor == "mono":
                out = sysm.track_monocular(ld[i], ts)
            elif sensor == "imu_mono":
                out = sysm.track_monocular_inertial(ld[i], imu, ts)
            elif sensor == "stereo":
                out = sysm.track_stereo(ld[i], ld[n + i], ts)
            elif sensor == "imu_stereo":
                out = sysm.track_stereo_inertial(ld[i], ld[n + i], imu, ts)
            else:
                raise ValueError(f"run_sequence: unsupported {sensor!r}")
            if not quiet and i % 20 == 0:
                print(f"[{i}] {out.state} inliers={out.n_inliers}")
    res = None
    gt = seq.gt_positions_at(np.asarray(sysm.timestamps))
    if gt is not None and len(gt) > 2:
        est = sysm.tracker.positions()
        res = ate_mod.ate(gt[2:], est[2:])
    return sysm, res


def run_sequences(seqs, cfg: Optional[SLAMConfig] = None,
                  max_frames: Optional[int] = None, quiet: bool = True):
    """Multi-sequence session (the num_seq > 1 mode of the example
    mains, Examples/Monocular/mono_euroc.cc:139): stream each sequence
    through ONE System, calling change_dataset between them — each
    sequence starts a fresh Atlas map; cross-map place recognition may
    later merge overlapping sessions. Returns the System."""
    from tpuslam.system import System

    cfg = cfg or euroc_config()
    sysm = System(cfg)
    sensor = cfg.sensor
    use_imu = sensor in ("imu_mono", "imu_stereo")
    for si, seq in enumerate(seqs):
        if si > 0:
            sysm.change_dataset()
        n = len(seq) if max_frames is None else min(len(seq), max_frames)
        for i in range(n):
            ts = seq.timestamp(i)
            imu = (seq.imu_between(i - 1, i)
                   if (use_imu and i > 0) else None)
            img = seq.image(i)
            if sensor == "mono":
                out = sysm.track_monocular(img, ts)
            elif sensor == "imu_mono":
                out = sysm.track_monocular_inertial(img, imu, ts)
            else:
                raise ValueError(
                    f"run_sequences: unsupported {sensor!r} (stereo "
                    f"multi-session rides run_sequence per sequence)")
            if not quiet and i % 20 == 0:
                print(f"[seq{si}:{i}] {out.state}")
    return sysm
