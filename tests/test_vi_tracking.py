"""Mono-inertial end-to-end: rendered frames + simulated IMU.

The decisive observable of IMU initialization is METRIC SCALE: after
init, the estimated trajectory must match ground truth WITHOUT scale
alignment (mono-only can never achieve this)."""

import numpy as np
import pytest

from tpuslam.config import CameraConfig, IMUConfig, ORBConfig, SLAMConfig
from tpuslam.datasets import synthetic
from tpuslam.eval import ate
from tpuslam.eval.ate import align_horn
from tpuslam.system import System


@pytest.mark.slow
def test_mono_inertial_metric_scale():
    h, w = 480, 640
    n_frames = 140
    fps, freq = 20.0, 200.0
    # speed_mod excites the accelerometer: a constant-speed orbit leaves
    # scale near-unobservable (only the small centripetal signal) and
    # inertial init is ill-conditioned — the reason EuRoC sequences open
    # with a shake. 900 world points keep the visual chain accurate
    # enough that the gyro-bias estimate is not dominated by visual
    # rotation drift (measured: sparse worlds give bg errors ~40x the
    # injected bias).
    sim = synthetic.simulate_imu(
        n_frames, fps=fps, imu_freq=freq, arc=1.2 * np.pi, speed_mod=0.5,
        bias_gyro=(0.002, -0.001, 0.003),
    )
    world = synthetic.make_world(n_points=900, h=h, w=w, seed=0)
    cfg = SLAMConfig(
        camera=CameraConfig(width=w, height=h, fx=float(world.cam[0]),
                            fy=float(world.cam[1]), cx=float(world.cam[2]),
                            cy=float(world.cam[3]), fps=fps),
        orb=ORBConfig(n_features=1024),
        imu=IMUConfig(freq=freq),
        sensor="imu_mono",
    )
    sysm = System(cfg)
    dt = np.full((int(freq / fps),), 1.0 / freq, np.float32)
    init_frame = None
    for i, (R, t) in enumerate(sim["poses"]):
        img = synthetic.render(world, R, t)
        imu = None
        if i > 0:
            imu = (sim["imu_gyro"][i - 1], sim["imu_acc"][i - 1], dt)
        sysm.track_monocular_inertial(img, imu, timestamp=i / fps)
        if init_frame is None and sysm.tracker.imu_initialized:
            init_frame = i

    tr = sysm.tracker
    assert tr.state == "OK"
    assert tr.imu_initialized, "IMU never initialized"
    # Bias estimate is sane. The residual bg error on this fixture is
    # visual rotation drift absorbed by the bias (the inward orbit makes
    # yaw/translation nearly degenerate; the strong first-init gyro
    # prior, ref InitializeIMU(1e2, 1e10), bounds the damage).
    assert np.all(np.abs(tr.bg) < 0.1)
    assert tr.atlas.n_maps == 0, "tracking was lost and the map reset"

    # Evaluate the POST-INIT segment only: frames before IMU init were
    # recorded at the arbitrary visual scale (the reference's trajectory
    # export rewrites them through updated keyframe poses — round 2).
    est = tr.positions()[init_frame + 1:]
    gt = np.stack([-R.T @ t for R, t in sim["poses"]])[init_frame + 1:]
    res = ate.ate(gt, est)
    # Metric scale: Horn's optimal scale must be near 1 (mono-only runs
    # on this fixture come out at scale ~6-9); the residual error
    # reflects the coarse init — round-2 VIBA tuning tightens it.
    assert 0.5 < res.scale < 2.0, f"scale {res.scale} not metric"
    # Unscaled ATE bounded (drift still present, no loop closure here).
    assert res.rmse < 3.0, res.rmse
