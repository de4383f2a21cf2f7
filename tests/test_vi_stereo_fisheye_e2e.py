"""Fisheye (KB8) stereo-inertial end to end — the TUM-VI configuration:
non-rectified rig (lapping-area matching + per-pair triangulation,
/root/reference/src/Frame.cc:1228) + IMU, with the right-camera
reprojection rows (EdgeSE3ProjectXYZToBody,
/root/reference/include/OptimizableTypes.h:117) carrying metric scale
through the VI pose optimizers and the VI window BA (the
LocalInertialBA stereo edges for KB8 rigs, src/Optimizer.cc:4571).

Decisive observables mirror test_vi_stereo_e2e (rectified): metric
scale without Horn alignment from frame one surviving the IMU init
ladder, gravity/bias convergence, blackout ride-through.
"""

import numpy as np
import pytest

from tpuslam.config import CameraConfig, IMUConfig, ORBConfig, SLAMConfig
from tpuslam.datasets import faults, synthetic
from tpuslam.eval import ate
from tpuslam.system import System

KB8 = (-0.012, 0.0021, -0.0009, 0.0002)
BASELINE = 0.5  # m


@pytest.fixture(scope="module")
def vi_kb8_run():
    h, w = 480, 640
    n_frames = 130
    fps, freq = 20.0, 200.0
    cth, sth = np.cos(np.deg2rad(10.0)), np.sin(np.deg2rad(10.0))
    Tbc = np.array([[1, 0, 0, 0.05],
                    [0, cth, -sth, -0.02],
                    [0, sth, cth, 0.03],
                    [0, 0, 0, 1]], np.float64)
    sim = synthetic.simulate_imu(
        n_frames, fps=fps, imu_freq=freq, arc=1.1 * np.pi, speed_mod=0.8,
        speed_cycles=5.0,
        bias_gyro=(0.002, -0.001, 0.003),
        noise_gyro=1.7e-4 * np.sqrt(freq), noise_acc=2.0e-3 * np.sqrt(freq),
        Tbc=Tbc,
    )
    world = synthetic.make_world(n_points=900, h=h, w=w, seed=0)
    Tlr = np.eye(4, dtype=np.float32)
    Tlr[0, 3] = BASELINE
    cfg = SLAMConfig(
        camera=CameraConfig(
            model="kb8", width=w, height=h,
            fx=float(world.cam[0]), fy=float(world.cam[1]),
            cx=float(world.cam[2]), cy=float(world.cam[3]),
            fps=fps, dist=KB8,
            bf=BASELINE * float(world.cam[0]),
            params_right=(float(world.cam[0]), float(world.cam[1]),
                          float(world.cam[2]), float(world.cam[3])),
            dist_right=KB8,
            Tlr=tuple(float(v) for v in Tlr.reshape(-1)),
        ),
        orb=ORBConfig(n_features=1024),
        imu=IMUConfig(freq=freq, Tbc=tuple(Tbc.reshape(-1).tolist()),
                      viba1_t=1.0, viba2_t=2.0, scale_ref_interval=2.0),
        sensor="imu_stereo",
    )
    sysm = System(cfg)
    sched = faults.FaultSchedule.blackout(95, 10)
    off = np.array([BASELINE, 0, 0], np.float32)
    dt = np.full((int(freq / fps),), 1.0 / freq, np.float32)
    init_frame = None
    states = []
    for i, (R, t) in enumerate(sim["poses"]):
        img_l = faults.apply_frame_fault(
            synthetic.render(world, R, t, kb8=KB8), i, sched)
        img_r = faults.apply_frame_fault(
            synthetic.render(world, R, t - off, kb8=KB8), i, sched)
        imu = None
        if i > 0:
            imu = (sim["imu_gyro"][i - 1], sim["imu_acc"][i - 1], dt)
        out = sysm.track_stereo_inertial(img_l, img_r, imu,
                                         timestamp=i / fps)
        states.append(out.state)
        if init_frame is None and sysm.tracker.imu_initialized:
            init_frame = i
    return sysm, sim, states, init_frame


@pytest.mark.slow
def test_kb8_stereo_inertial_metric_scale(vi_kb8_run):
    sysm, sim, states, init_frame = vi_kb8_run
    tr = sysm.tracker
    assert tr.state == "OK"
    assert tr.imu_initialized, "IMU never initialized"
    assert np.all(np.abs(tr.bg) < 0.1), f"gyro bias {tr.bg}"
    assert np.all(np.abs(tr.ba) < 0.3), f"acc bias {tr.ba}"

    ok = np.array([s == "OK" for s in states])
    est = np.stack(tr.positions())[ok]
    gt = np.stack([-R.T @ t for R, t in sim["poses"]])[ok]
    res = ate.ate(gt, est)
    assert 0.93 < res.scale < 1.08, f"scale {res.scale:.3f} not metric"
    assert res.rmse < 0.7, f"unscaled ATE {res.rmse:.3f} m"


@pytest.mark.slow
def test_kb8_stereo_inertial_blackout(vi_kb8_run):
    sysm, sim, states, init_frame = vi_kb8_run
    tr = sysm.tracker
    assert init_frame is not None and init_frame < 95, \
        f"IMU init too late ({init_frame}) for the blackout to test it"
    n_rl = sum(s == "RECENTLY_LOST" for s in states)
    assert 6 <= n_rl <= 20, f"RECENTLY_LOST frames: {n_rl}"
    assert "LOST" not in states, "dead-reckoning grace was not enough"
    assert tr.atlas.n_maps == 0, "blackout reset the map"
    post = states[105:115]
    assert "OK" in post, f"no recovery after blackout: {post}"
