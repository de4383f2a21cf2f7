"""TUM-VI dataset presets + loader.

The TUM-VI rooms/corridors sequences ship in the same ASL folder layout
as EuRoC (mav0/cam0/data.csv, mav0/imu0/data.csv), so `EuRoCSequence`
reads them directly; what TUM-VI adds is the 512x512 Kannala-Brandt-8
fisheye camera and its own IMU calibration. Presets transcribed from
the reference's configs:
/root/reference/Examples/Monocular-Inertial/TUM_512.yaml (KB8
intrinsics :7-19, Tbc :32-39, IMU noise :50-55) and
Examples/Stereo-Inertial/TUM_512.yaml (the right-camera rig).

The reference's tum_vi example mains (mono_inertial_tum_vi.cc) read an
image FOLDER plus an external times file instead of data.csv;
`TimesFileSequence` covers that layout.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from tpuslam.config import CameraConfig, IMUConfig, ORBConfig, SLAMConfig
from tpuslam.datasets.euroc import EuRoCSequence, run_sequence  # noqa: F401

# Body-from-camera Tbc of cam0 (TUM_512.yaml:32-39).
TUMVI_TBC = (
    -0.9995250378696743, 0.0075019185074052044, -0.02989013031643309,
    0.045574835649698026,
    0.029615343885863205, -0.03439736061393144, -0.998969345370175,
    -0.071161801837997044,
    -0.008522328211654736, -0.9993800792498829, 0.03415885127385616,
    -0.044681254117144367,
    0.0, 0.0, 0.0, 1.0,
)


def tumvi_camera_config() -> CameraConfig:
    """cam0 KB8 fisheye intrinsics (TUM_512.yaml:7-23)."""
    return CameraConfig(
        model="kb8",
        width=512, height=512,
        fx=190.978477, fy=190.973307, cx=254.931706, cy=256.897442,
        dist=(0.003482389402, 0.000715034845, -0.002053236141,
              0.000202936736),
        fps=20.0,
        # Stereo rig baseline*fx (Stereo-Inertial/TUM_512.yaml
        # Camera.bf).
        bf=19.3079,
    )


def tumvi_config(sensor: str = "imu_mono") -> SLAMConfig:
    """TUM-VI preset: KB8 fisheye + the VINS-Mono IMU calibration the
    reference uses (TUM_512.yaml:50-55)."""
    return SLAMConfig(
        camera=tumvi_camera_config(),
        orb=ORBConfig(n_features=1024),
        imu=IMUConfig(freq=200.0, noise_gyro=0.00016, noise_acc=0.0028,
                      walk_gyro=0.000022, walk_acc=0.00086,
                      Tbc=TUMVI_TBC),
        sensor=sensor,
    )


class TimesFileSequence:
    """Image folder + external times file, the layout of the reference's
    tum_vi example mains (LoadImages,
    /root/reference/Examples/Monocular-Inertial/mono_inertial_tum_vi.cc):
    each line of the times file is a timestamp (s or ns); images are
    `<folder>/<timestamp>.png`. Optional EuRoC-format IMU csv. Exposes
    the same access surface as EuRoCSequence (timestamp / image /
    imu_between / gt_positions_at) so run_sequence-style loops work on
    either."""

    def __init__(self, image_dir, times_file, imu_csv=None):
        self.image_dir = Path(image_dir)
        self.frames: List[Tuple[float, str]] = []
        for line in Path(times_file).read_text().splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            tok = line.split()[0]
            # ns when integer-and-huge (TUM-VI times files carry ns).
            t = float(tok)
            if t > 1e14:
                t *= 1e-9
            self.frames.append((t, f"{tok}.png"))
        self.imu = None
        if imu_csv is not None and Path(imu_csv).exists():
            self.imu = EuRoCSequence._read_imu_csv(Path(imu_csv))
        self.ground_truth = None

    def __len__(self) -> int:
        return len(self.frames)

    def timestamp(self, i: int) -> float:
        return self.frames[i][0]

    def image(self, i: int) -> np.ndarray:
        from PIL import Image

        return np.asarray(
            Image.open(self.image_dir / self.frames[i][1]).convert("L"),
            np.float32)

    def imu_between(self, i: int, j: int):
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
        return None
