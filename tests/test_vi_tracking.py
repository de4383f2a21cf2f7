"""Mono-inertial end-to-end: rendered frames + simulated IMU.

The decisive observable of IMU initialization is METRIC SCALE: after
init, the estimated trajectory must match ground truth WITHOUT scale
alignment (mono-only can never achieve this). The same run also
exercises the RECENTLY_LOST two-stage loss machine: a 10-frame blackout
after init must be survived by IMU dead-reckoning and guided-tracking
re-entry (PredictStateIMU -> TrackLocalMap,
/root/reference/src/Tracking.cc:1800,1835-1874) — no Atlas reset."""

import numpy as np
import pytest

from tpuslam.config import CameraConfig, IMUConfig, ORBConfig, SLAMConfig
from tpuslam.datasets import faults, synthetic
from tpuslam.eval import ate
from tpuslam.system import System


@pytest.fixture(scope="module")
def vi_run():
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
    # EuRoC ADIS16448 datasheet noise at 200 Hz (discrete sigma =
    # density * sqrt(freq), Tracking.cc:945-951): gyro 1.7e-4*sqrt(200)
    # ~= 2.4e-3 rad/s, acc 2.0e-3*sqrt(200) ~= 2.8e-2 m/s^2. Nontrivial
    # body-from-camera extrinsics (10 deg tilt + 5 cm lever arm) so the
    # Tbc chain through prediction/preintegration/init is exercised, not
    # just the identity special case.
    cth, sth = np.cos(np.deg2rad(10.0)), np.sin(np.deg2rad(10.0))
    Tbc = np.array([[1, 0, 0, 0.05],
                    [0, cth, -sth, -0.02],
                    [0, sth, cth, 0.03],
                    [0, 0, 0, 1]], np.float64)
    # speed_mod=0.8 / 5 cycles: EuRoC-grade excitation. At 0.5/3 the
    # inertial-only problem is nearly blind to scale (estimates scatter
    # 1.9-5.0 between consecutive windows and the ladder converges to a
    # 1.4x-off map); at 0.8/5 the same ladder lands within 4% of metric.
    sim = synthetic.simulate_imu(
        n_frames, fps=fps, imu_freq=freq, arc=1.2 * np.pi, speed_mod=0.8,
        speed_cycles=5.0,
        bias_gyro=(0.002, -0.001, 0.003),
        noise_gyro=1.7e-4 * np.sqrt(freq), noise_acc=2.0e-3 * np.sqrt(freq),
        Tbc=Tbc,
    )
    world = synthetic.make_world(n_points=900, h=h, w=w, seed=0)
    cfg = SLAMConfig(
        camera=CameraConfig(width=w, height=h, fx=float(world.cam[0]),
                            fy=float(world.cam[1]), cx=float(world.cam[2]),
                            cy=float(world.cam[3]), fps=fps),
        orb=ORBConfig(n_features=1024),
        # Ladder times shrunk to the short fixture (reference defaults
        # assume minutes-long sequences; IMUConfig docstring): init lands
        # ~2.9 s in, so VIBA1/VIBA2 must fire within the remaining 4 s
        # for the scale to converge to metric.
        imu=IMUConfig(freq=freq, Tbc=tuple(Tbc.reshape(-1).tolist()),
                      viba1_t=1.0, viba2_t=2.0, scale_ref_interval=2.0),
        sensor="imu_mono",
    )
    sysm = System(cfg)
    sched = faults.FaultSchedule.blackout(100, 10)
    dt = np.full((int(freq / fps),), 1.0 / freq, np.float32)
    init_frame = None
    states = []
    for i, (R, t) in enumerate(sim["poses"]):
        img = faults.apply_frame_fault(synthetic.render(world, R, t), i,
                                       sched)
        imu = None
        if i > 0:
            imu = (sim["imu_gyro"][i - 1], sim["imu_acc"][i - 1], dt)
        out = sysm.track_monocular_inertial(img, imu, timestamp=i / fps)
        states.append(out.state)
        if init_frame is None and sysm.tracker.imu_initialized:
            init_frame = i
    return sysm, sim, states, init_frame


@pytest.mark.slow
def test_mono_inertial_metric_scale(vi_run):
    sysm, sim, states, init_frame = vi_run
    tr = sysm.tracker
    assert tr.state == "OK"
    assert tr.imu_initialized, "IMU never initialized"
    # Bias estimate is sane. The residual bg error on this fixture is
    # visual rotation drift absorbed by the bias (the inward orbit makes
    # yaw/translation nearly degenerate; the strong first-init gyro
    # prior, ref InitializeIMU(1e2, 1e10), bounds the damage).
    assert np.all(np.abs(tr.bg) < 0.1)

    # Evaluate the POST-INIT OK frames (pre-init frames carry the
    # arbitrary visual scale in their reference keyframes' history).
    ok = np.array([s == "OK" for s in states])
    ok[: init_frame + 1] = False
    est = np.stack(tr.positions())[ok]
    gt = np.stack([-R.T @ t for R, t in sim["poses"]])[ok]
    res = ate.ate(gt, est)
    # Metric scale: Horn's optimal scale must be near 1 (mono-only runs
    # on this fixture come out at scale ~6). The VIBA1/VIBA2/scale-ref
    # ladder converges it to within a few percent (measured 0.976 with
    # EuRoC-datasheet noise + nontrivial Tbc).
    assert 0.8 < res.scale < 1.25, f"scale {res.scale} not metric"
    # Gate re-measured (r04) after keyframe-frame trajectory entries
    # became exact identities (the old export mixed pre-/post-superstep
    # worlds; fixing it shifts every KF frame's exported pose by its BA
    # refinement delta): scale improved 0.976 -> 0.988, rmse moved
    # 0.59 -> 0.62 on this chaotic fixture.
    assert res.rmse < 0.68, res.rmse


@pytest.mark.slow
def test_recently_lost_dead_reckoning(vi_run):
    """The blackout frames must ride through RECENTLY_LOST (not LOST),
    recover within a few frames of images returning, and never reset
    the map into the Atlas."""
    sysm, sim, states, init_frame = vi_run
    tr = sysm.tracker
    n_rl = sum(s == "RECENTLY_LOST" for s in states)
    assert 8 <= n_rl <= 20, f"RECENTLY_LOST frames: {n_rl}"
    assert "LOST" not in states, "dead-reckoning grace was not enough"
    assert tr.atlas.n_maps == 0, "blackout reset the map"
    # Recovery happened promptly after the blackout window [100, 110).
    post = states[110:118]
    assert "OK" in post, f"no recovery after blackout: {post}"
