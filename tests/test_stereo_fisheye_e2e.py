"""KB8 fisheye stereo, end to end: non-rectified rig -> lapping-area
matching + per-pair triangulation (Frame::ComputeStereoFishEyeMatches,
/root/reference/src/Frame.cc:1228 + KannalaBrandt8::TriangulateMatches,
include/CameraModels/KannalaBrandt8.h:94).

The decisive observable: METRIC SCALE with no IMU and no rectification —
depth comes purely from the calibrated rig extrinsics through the
fisheye model. Horn's optimal scale must be ~1 (monocular KB8 comes out
at an arbitrary scale)."""

import numpy as np
import pytest

from tpuslam.config import CameraConfig, ORBConfig, SLAMConfig
from tpuslam.datasets import synthetic
from tpuslam.eval import ate
from tpuslam.system import System

KB8 = (-0.012, 0.0021, -0.0009, 0.0002)  # mild TUM-VI-like coefficients
BASELINE = 0.5  # m


@pytest.mark.slow
def test_kb8_stereo_metric_scale_e2e():
    h, w = 480, 640
    world = synthetic.make_world(n_points=900, h=h, w=w, seed=0)
    poses = synthetic.orbit_trajectory(100, arc=0.75 * np.pi)
    Tlr = np.eye(4, dtype=np.float32)
    Tlr[0, 3] = BASELINE  # x_left = x_right + [b, 0, 0]
    cfg = SLAMConfig(
        camera=CameraConfig(
            model="kb8", width=w, height=h,
            fx=float(world.cam[0]), fy=float(world.cam[1]),
            cx=float(world.cam[2]), cy=float(world.cam[3]),
            fps=20.0, dist=KB8,
            bf=BASELINE * float(world.cam[0]),
            params_right=(float(world.cam[0]), float(world.cam[1]),
                          float(world.cam[2]), float(world.cam[3])),
            dist_right=KB8,
            Tlr=tuple(float(v) for v in Tlr.reshape(-1)),
        ),
        orb=ORBConfig(n_features=1024),
        sensor="stereo",
    )
    sysm = System(cfg)
    off = np.array([BASELINE, 0, 0], np.float32)
    states = []
    for i, (R, t) in enumerate(poses):
        out = sysm.track_stereo(
            synthetic.render(world, R, t, kb8=KB8),
            synthetic.render(world, R, t - off, kb8=KB8),
            timestamp=i / 20.0)
        states.append(out.state)
    tr = sysm.tracker
    ok = np.array([s == "OK" for s in states])
    assert ok.sum() >= 95, f"only {int(ok.sum())}/100 frames tracked"
    est = np.stack(tr.positions())
    gt = np.stack([-R.T @ t for R, t in poses])
    res = ate.ate(gt[ok], est[ok])
    assert 0.9 < res.scale < 1.1, f"scale {res.scale:.3f} not metric"
    assert res.rmse < 0.7, f"unscaled ATE {res.rmse:.3f} m"
