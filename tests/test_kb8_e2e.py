"""KB8 fisheye tracking, end to end.

The synthetic world is rendered through the same Kannala-Brandt
equidistant model the tracker is configured with (cfg.camera.model =
"kb8", k1..k4 in cfg.camera.dist) — every projection/unprojection in
the pipeline (init bearings, guided tracking, triangulation, fuse,
local BA, relocalization) must dispatch through the fisheye math
(KannalaBrandt8, /root/reference/src/CameraModels/KannalaBrandt8.cpp)
or tracking collapses within a few frames: at this image border the
equidistant-vs-pinhole discrepancy is tens of pixels.
"""

import numpy as np
import pytest

from tpuslam.config import CameraConfig, ORBConfig, SLAMConfig
from tpuslam.datasets import synthetic
from tpuslam.eval import ate
from tpuslam.system import System

KB8 = (-0.012, 0.0021, -0.0009, 0.0002)  # mild TUM-VI-like coefficients


@pytest.mark.slow
def test_kb8_fisheye_e2e():
    h, w = 480, 640
    world = synthetic.make_world(n_points=900, h=h, w=w, seed=0)
    poses = synthetic.orbit_trajectory(120, arc=0.9 * np.pi)
    cfg = SLAMConfig(
        camera=CameraConfig(model="kb8", width=w, height=h,
                            fx=float(world.cam[0]), fy=float(world.cam[1]),
                            cx=float(world.cam[2]), cy=float(world.cam[3]),
                            fps=20.0, dist=KB8),
        orb=ORBConfig(n_features=1024),
        sensor="mono",
    )
    sysm = System(cfg)
    states = []
    for i, (R, t) in enumerate(poses):
        out = sysm.track_monocular(
            synthetic.render(world, R, t, kb8=KB8), timestamp=i / 20.0)
        states.append(out.state)
    tr = sysm.tracker
    ok = np.array([s == "OK" for s in states])
    assert ok.sum() >= 114, f"only {int(ok.sum())}/120 frames tracked"
    est = np.stack(tr.positions())
    gt = np.stack([-R.T @ t for R, t in poses])
    res = ate.ate(gt[ok], est[ok])
    assert res.rmse_scaled < 0.35, f"ATE {res.rmse_scaled:.3f} m"
