"""Stereo and RGBD tracking modes, end to end.

The decisive stereo observable is METRIC SCALE WITHOUT IMU: depth from
the calibrated baseline pins the map scale from the very first keyframe
(StereoInitialization, /root/reference/src/Tracking.cc:2301), which
monocular tracking can never do. The right image is rendered from the
same world with the camera displaced by the baseline along +x.
"""

import numpy as np
import pytest

from tpuslam.config import CameraConfig, ORBConfig, SLAMConfig
from tpuslam.datasets import synthetic
from tpuslam.eval import ate
from tpuslam.system import System

BASELINE = 0.5  # m


def _cfg(world, sensor, fps=20.0):
    return SLAMConfig(
        camera=CameraConfig(width=640, height=480,
                            fx=float(world.cam[0]), fy=float(world.cam[1]),
                            cx=float(world.cam[2]), cy=float(world.cam[3]),
                            fps=fps, bf=BASELINE * float(world.cam[0])),
        orb=ORBConfig(n_features=1024),
        sensor=sensor,
    )


@pytest.mark.slow
def test_stereo_metric_scale_e2e():
    world = synthetic.make_world(n_points=900, h=480, w=640, seed=0)
    poses = synthetic.orbit_trajectory(120, arc=0.9 * np.pi)
    sysm = System(_cfg(world, "stereo"))
    off = np.array([BASELINE, 0, 0], np.float32)
    states = []
    for i, (R, t) in enumerate(poses):
        out = sysm.track_stereo(synthetic.render(world, R, t),
                                synthetic.render(world, R, t - off),
                                timestamp=i / 20.0)
        states.append(out.state)
    tr = sysm.tracker
    ok = np.array([s == "OK" for s in states])
    assert ok.sum() >= 115, f"only {int(ok.sum())}/120 frames tracked"
    est = np.stack(tr.positions())
    gt = np.stack([-R.T @ t for R, t in poses])
    res = ate.ate(gt[ok], est[ok])
    # Horn's optimal scale must be ~1 (metric): mono comes out at 6-9x.
    assert 0.93 < res.scale < 1.08, f"scale {res.scale:.3f} not metric"
    assert res.rmse < 0.6, f"unscaled ATE {res.rmse:.3f} m"


@pytest.mark.slow
def test_rgbd_metric_scale_e2e():
    """RGBD: per-pixel depth replaces the stereo matcher; same metric
    property (ComputeStereoFromRGBD role, src/Frame.cc:1143)."""
    world = synthetic.make_world(n_points=900, h=480, w=640, seed=1)
    poses = synthetic.orbit_trajectory(80, arc=0.6 * np.pi)
    sysm = System(_cfg(world, "rgbd"))
    states = []
    for i, (R, t) in enumerate(poses):
        img = synthetic.render(world, R, t)
        depth = synthetic.render_depth(world, R, t)
        out = sysm.track_rgbd(img, depth, timestamp=i / 20.0)
        states.append(out.state)
    tr = sysm.tracker
    ok = np.array([s == "OK" for s in states])
    assert ok.sum() >= 76, f"only {int(ok.sum())}/80 frames tracked"
    est = np.stack(tr.positions())
    gt = np.stack([-R.T @ t for R, t in poses])
    res = ate.ate(gt[ok], est[ok])
    assert 0.93 < res.scale < 1.08, f"scale {res.scale:.3f} not metric"
    assert res.rmse < 0.6, f"unscaled ATE {res.rmse:.3f} m"
