"""Visual-inertial solver tests on simulated IMU + rendered-free visual
observations (exact ground truth)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.datasets import synthetic
from tpuslam.geometry import lie
from tpuslam.imu import preintegration as pre
from tpuslam.solver import vi_ba

CAM = jnp.array([450.0, 450.0, 320.0, 240.0], jnp.float32)
G = 9.81
FREQ = 200.0
NGA, WALK = pre.discrete_noise(1.7e-4, 2.0e-3, 1.9e-5, 3.0e-3, FREQ)
WALK_INFO = jnp.full((6,), 1.0 / 1e-3, jnp.float32)


@pytest.fixture(scope="module")
def sim():
    return synthetic.simulate_imu(41, fps=20.0, imu_freq=FREQ,
                                  bias_gyro=(0.003, -0.002, 0.004))


def preint_between(sim, f0, f1, bg=None, ba=None):
    """Preintegrate all samples between frame f0 and f1."""
    acc = sim["imu_acc"][f0:f1].reshape(-1, 3)
    gyr = sim["imu_gyro"][f0:f1].reshape(-1, 3)
    n = acc.shape[0]
    return pre.integrate(
        pre.init_state(bg, ba), jnp.asarray(acc), jnp.asarray(gyr),
        jnp.full((n,), sim["imu_dt"], jnp.float32), jnp.ones((n,), bool),
        NGA, WALK,
    )


def test_simulated_imu_consistency(sim):
    """Dead-reckoning the simulated IMU reproduces the trajectory."""
    bg = jnp.asarray([0.003, -0.002, 0.004], jnp.float32)
    st = preint_between(sim, 0, 40)
    R0 = jnp.asarray(sim["Rwb"][0])
    p0 = jnp.asarray(sim["pwb"][0])
    v0 = jnp.asarray(sim["vel"][0])
    Rj, pj, vj = pre.predict(st, R0, p0, v0, bg, jnp.zeros(3))
    perr = np.linalg.norm(pj - sim["pwb"][40])
    Rerr = np.linalg.norm(np.asarray(
        lie.so3_log(jnp.asarray(sim["Rwb"][40]).T @ Rj)))
    # 2 s of dead reckoning on a very dynamic orbit (v ~ 11 m/s,
    # a ~ 14 m/s^2): cm-level from midpoint-integration discretization.
    assert perr < 0.15, perr
    assert Rerr < 0.01, Rerr


def test_inertial_init_recovers_scale_gravity_bias(sim):
    """Visual map rotated + scaled vs inertial truth: init must recover
    the scale, gravity direction, and gyro bias (InertialOptimization
    semantics, staged priors)."""
    step = 5                      # a keyframe every 0.25 s
    kf_frames = list(range(0, 41, step))
    K = len(kf_frames)
    R_tilt = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.15, 0.0],
                                                jnp.float32)))
    s_vis = 0.5
    Rwb_vis = np.stack([R_tilt @ sim["Rwb"][f] for f in kf_frames])
    pwb_vis = np.stack([s_vis * (R_tilt @ sim["pwb"][f]) for f in kf_frames])

    preints = [preint_between(sim, kf_frames[i], kf_frames[i + 1])
               for i in range(K - 1)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *preints)

    res = vi_ba.inertial_init(
        jnp.asarray(Rwb_vis), jnp.asarray(pwb_vis), stacked,
        jnp.ones((K - 1,), bool), prior_g=1e2, prior_a=1e10,
    )
    assert abs(float(res.scale) - 1.0 / s_vis) < 0.05, float(res.scale)
    g_est = np.asarray(res.Rwg @ jnp.asarray([0.0, 0.0, -G], jnp.float32))
    g_true = R_tilt @ np.array([0.0, 0.0, -G])
    cos = g_est @ g_true / (np.linalg.norm(g_est) * np.linalg.norm(g_true))
    assert cos > 0.9995, cos
    np.testing.assert_allclose(res.bg, [0.003, -0.002, 0.004], atol=5e-4)


def make_visual_obs(rng, Rwb, pwb, M=256):
    """Dense VI-window observation grid from ground truth."""
    K = Rwb.shape[0]
    X = rng.uniform([-4, -4, -2], [4, 4, 2], size=(M, 3)).astype(np.float32)
    obs_uv = np.zeros((K, M, 2), np.float32)
    obs_mask = np.zeros((K, M), bool)
    for k in range(K):
        Rcw = Rwb[k].T
        tcw = -Rcw @ pwb[k]
        Xc = X @ Rcw.T + tcw
        z = Xc[:, 2]
        uv = np.stack([450 * Xc[:, 0] / np.maximum(z, 1e-6) + 320,
                       450 * Xc[:, 1] / np.maximum(z, 1e-6) + 240], 1)
        obs_uv[k] = uv + rng.normal(0, 0.3, uv.shape)
        obs_mask[k] = (z > 0.5) & (np.abs(uv[:, 0] - 320) < 400) & \
                      (np.abs(uv[:, 1] - 240) < 300)
    return X, obs_uv, obs_mask


def test_optimize_vi_window(sim, rng):
    """Perturbed VI window converges back to ground truth."""
    step = 5
    kf_frames = list(range(0, 21, step))
    K = len(kf_frames)
    bg_true = np.array([0.003, -0.002, 0.004], np.float32)
    Rwb = np.stack([sim["Rwb"][f] for f in kf_frames])
    pwb = np.stack([sim["pwb"][f] for f in kf_frames])
    vel = np.stack([sim["vel"][f] for f in kf_frames])
    X, obs_uv, obs_mask = make_visual_obs(rng, Rwb, pwb)
    M = X.shape[0]

    preints = [preint_between(sim, kf_frames[i], kf_frames[i + 1])
               for i in range(K - 1)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *preints)

    # Perturb all but the first keyframe.
    Rp, pp, vp = Rwb.copy(), pwb.copy(), vel.copy()
    for k in range(1, K):
        dR = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(size=3) * 0.01, jnp.float32)))
        Rp[k] = Rp[k] @ dR
        pp[k] = pp[k] + rng.normal(size=3).astype(np.float32) * 0.05
        vp[k] = vp[k] + rng.normal(size=3).astype(np.float32) * 0.1
    Xp = X + rng.normal(size=X.shape).astype(np.float32) * 0.03

    fixed = np.zeros(K, bool)
    fixed[0] = True
    win = vi_ba.VIWindow(
        Rwb=jnp.asarray(Rp), pwb=jnp.asarray(pp), vel=jnp.asarray(vp),
        bg=jnp.tile(bg_true, (K, 1)), ba=jnp.zeros((K, 3), jnp.float32),
        fixed=jnp.asarray(fixed),
        points=jnp.asarray(Xp), pt_valid=jnp.ones((M,), bool),
        obs_uv=jnp.asarray(obs_uv), obs_mask=jnp.asarray(obs_mask),
        obs_inv_sigma2=jnp.ones((K, M), jnp.float32),
        preint=stacked, edge_valid=jnp.ones((K - 1,), bool),
        Rcb=jnp.eye(3, dtype=jnp.float32), tcb=jnp.zeros(3, jnp.float32),
    )
    res = vi_ba.optimize_vi(
        win, CAM, jnp.asarray([0, 0, -G], jnp.float32), WALK_INFO, iters=10)

    for k in range(1, K):
        perr = np.linalg.norm(res.pwb[k] - pwb[k])
        verr = np.linalg.norm(res.vel[k] - vel[k])
        assert perr < 0.03, (k, perr)  # last KF is one-sided-constrained
        assert verr < 0.15, (k, verr)
    # Fixed keyframe untouched.
    np.testing.assert_allclose(res.pwb[0], pwb[0], atol=1e-6)


def test_optimize_pose_vi(sim, rng):
    """Single-frame VI pose optimization from an IMU-predicted init."""
    f0, f1 = 0, 4
    bg_true = jnp.asarray([0.003, -0.002, 0.004], jnp.float32)
    st = preint_between(sim, f0, f1)
    R0 = jnp.asarray(sim["Rwb"][f0])
    p0 = jnp.asarray(sim["pwb"][f0])
    v0 = jnp.asarray(sim["vel"][f0])
    Rp, pp, vp = pre.predict(st, R0, p0, v0, bg_true, jnp.zeros(3))

    # Visual matches at the true frame pose.
    Rt = sim["Rwb"][f1]
    pt = sim["pwb"][f1]
    N = 200
    X = rng.uniform([-4, -4, -2], [4, 4, 2], size=(N, 3)).astype(np.float32)
    Rcw = Rt.T
    tcw = -Rcw @ pt
    Xc = X @ Rcw.T + tcw
    valid = Xc[:, 2] > 0.5
    uv = np.stack([450 * Xc[:, 0] / np.maximum(Xc[:, 2], 1e-6) + 320,
                   450 * Xc[:, 1] / np.maximum(Xc[:, 2], 1e-6) + 240], 1)
    uv += rng.normal(0, 0.5, uv.shape)

    res = vi_ba.optimize_pose_vi(
        Rp, pp, vp, bg_true, jnp.zeros(3, jnp.float32),
        R0, p0, v0, st,
        jnp.asarray(X), jnp.asarray(uv, jnp.float32),
        jnp.ones((N,), jnp.float32), jnp.asarray(valid),
        CAM, jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.asarray([0, 0, -G], jnp.float32), WALK_INFO,
    )
    perr = np.linalg.norm(res.pwb - pt)
    Rerr = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(Rt).T @ res.Rwb)))
    assert perr < 0.01, perr
    assert Rerr < 0.005, Rerr
    assert int(res.n_inliers) > 150
