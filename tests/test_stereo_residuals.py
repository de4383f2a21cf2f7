"""Stereo (3-dof) residuals in pose optimization and local BA.

The reference adds an (u, v, u - bf/z) residual per stereo-matched
keypoint (EdgeStereo / EdgeStereoSE3ProjectXYZOnlyPose,
/root/reference/include/G2oTypes.h:439, src/Optimizer.cc:931). Its
defining property: metric scale becomes OBSERVABLE in bundle adjustment
— a mono-consistent scaled replica of the scene has zero mono residual
but nonzero stereo residual, so BA with stereo observations must pull
the map back to metric scale.
"""

import jax.numpy as jnp
import numpy as np

from tpuslam.geometry import lie
from tpuslam.solver import local_ba, pose_opt

CAM = jnp.array([450.0, 450.0, 320.0, 240.0], jnp.float32)
BF = 45.0  # baseline * fx  (0.1 m baseline)


def make_scene(rng, n_pts=200, n_kf=4, spread=4.0, depth=8.0):
    X = rng.uniform([-spread, -spread, depth - 2],
                    [spread, spread, depth + 2],
                    size=(n_pts, 3)).astype(np.float32)
    poses = [(np.eye(3, dtype=np.float32), np.zeros(3, np.float32))]
    for k in range(1, n_kf):
        w = rng.normal(size=3) * 0.02
        R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
        t = np.array([0.4 * k, 0.1 * rng.normal(), 0.05 * k], np.float32)
        poses.append((R.astype(np.float32), t))
    return X, poses


def project_np(R, t, X):
    Xc = X @ np.asarray(R).T + np.asarray(t)
    u = 450.0 * Xc[:, 0] / Xc[:, 2] + 320.0
    v = 450.0 * Xc[:, 1] / Xc[:, 2] + 240.0
    return np.stack([u, v], 1).astype(np.float32), Xc[:, 2].astype(np.float32)


def test_pose_opt_stereo_converges_and_gates(rng):
    """Stereo residual rows keep pose accuracy and the 7.815 chi2 gate
    rejects keypoints whose right-image match is wrong."""
    X, poses = make_scene(rng, n_pts=150, n_kf=1, depth=6.0)
    R_true, t_true = np.eye(3, dtype=np.float32), np.array([0.1, 0.0, 0.2],
                                                     np.float32)
    uv, z = project_np(R_true, t_true, X)
    ur = (uv[:, 0] - BF / z).astype(np.float32)
    # 20 keypoints get a corrupted right match (bad stereo association).
    bad = np.zeros(150, bool)
    bad[:20] = True
    ur_obs = ur.copy()
    ur_obs[bad] += 25.0

    dR = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.03,
                                            jnp.float32)))
    R0 = jnp.asarray(dR @ R_true)
    t0 = jnp.asarray(t_true + rng.normal(size=3).astype(np.float32) * 0.1)

    res = pose_opt.optimize_pose(
        R0, t0, jnp.asarray(X), jnp.asarray(uv), jnp.ones(150),
        jnp.ones(150, bool), CAM, ur=jnp.asarray(ur_obs), bf=BF,
    )
    assert np.linalg.norm(res.t - t_true) < 0.01
    inl = np.asarray(res.inlier)
    # The mono rows of corrupted points are perfect, so only the stereo
    # chi2 can reject them.
    assert inl[bad].sum() == 0, inl[bad].sum()
    assert inl[~bad].sum() > 120


def _scaled_problem(rng, s, with_stereo):
    """Mono-consistent scene replica at scale s (pose 0 at origin is the
    only fixed anchor, so the mono gauge cannot correct scale)."""
    K, M = 4, 250
    X, poses = make_scene(rng, n_pts=M, n_kf=K)
    obs_uv = np.zeros((K, M, 2), np.float32)
    obs_ur = np.full((K, M), -1.0, np.float32)
    obs_mask = np.zeros((K, M), bool)
    for k, (R, t) in enumerate(poses):
        uv, z = project_np(R, t, X)
        obs_uv[k] = uv
        obs_mask[k] = z > 0.5
        obs_ur[k] = np.where(z > 0.5, uv[:, 0] - BF / z, -1.0)

    fixed = np.zeros(K, bool)
    fixed[0] = True
    kf_R = np.stack([p[0] for p in poses])
    kf_t = np.stack([s * p[1] for p in poses])   # scaled replica
    return local_ba.BAProblem(
        kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
        kf_fixed=jnp.asarray(fixed),
        points=jnp.asarray(s * X), pt_valid=jnp.ones(M, bool),
        obs_uv=jnp.asarray(obs_uv), obs_mask=jnp.asarray(obs_mask),
        obs_inv_sigma2=jnp.ones((K, M), jnp.float32),
        obs_ur=jnp.asarray(obs_ur) if with_stereo else None,
    ), X, poses


def test_local_ba_stereo_recovers_metric_scale(rng):
    s = 0.85
    prob, X, poses = _scaled_problem(rng, s, with_stereo=True)
    res = local_ba.optimize(prob, CAM, iters=20, bf=BF)
    # Scale estimate: ratio of recovered to true camera-1 baseline.
    for k in range(1, 4):
        ratio = (np.linalg.norm(np.asarray(res.kf_t[k]))
                 / np.linalg.norm(poses[k][1]))
        assert abs(ratio - 1.0) < 0.02, (k, ratio)
    perr = np.linalg.norm(np.asarray(res.points) - X, axis=1)
    assert np.median(perr) < 0.05, np.median(perr)


def test_local_ba_mono_cannot_fix_scale(rng):
    """Control: without stereo rows the scaled replica is a global
    optimum and BA must leave the scale where it was."""
    s = 0.85
    prob, X, poses = _scaled_problem(rng, s, with_stereo=False)
    res = local_ba.optimize(prob, CAM, iters=20)
    for k in range(1, 4):
        ratio = (np.linalg.norm(np.asarray(res.kf_t[k]))
                 / np.linalg.norm(poses[k][1]))
        assert abs(ratio - s) < 0.02, (k, ratio)


# ---------------------------------------------------------------------------
# Non-rectified (fisheye) rigs: right-camera reprojection rows
# (EdgeSE3ProjectXYZToBody, /root/reference/include/OptimizableTypes.h:117)
# ---------------------------------------------------------------------------

KB8 = jnp.array([190.97, 190.97, 254.93, 256.89,
                 0.0034823894022493434, 0.0007150348452162257,
                 -0.0020532361418706202, 0.00020293673591811182],
                jnp.float32)  # TUM-VI-like left intrinsics
KB8_R = jnp.array([190.44, 190.44, 252.59, 254.91,
                   0.0034003170790442797, 0.001766278153469831,
                   -0.00266312569781606, 0.0003299517423931039],
                  jnp.float32)


def _kb8_rig():
    """x_l = R_lr x_r + t_lr (0.101 m baseline, slight toe-in)."""
    w = jnp.asarray([0.004, -0.008, 0.002], jnp.float32)
    R_lr = np.asarray(lie.so3_exp(w))
    t_lr = np.array([0.10106, -0.00020, -0.00105], np.float32)
    R_rl = R_lr.T
    t_rl = (-R_lr.T @ t_lr).astype(np.float32)
    return R_rl, t_rl


def _kb8_scene(rng, K=4, M=250):
    """Wide-FOV scene in front of the rig."""
    X = rng.uniform([-4.0, -4.0, 1.5], [4.0, 4.0, 6.0],
                    size=(M, 3)).astype(np.float32)
    poses = [(np.eye(3, dtype=np.float32), np.zeros(3, np.float32))]
    for k in range(1, K):
        w = rng.normal(size=3) * 0.02
        R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
        t = np.array([0.3 * k, 0.1 * rng.normal(), 0.04 * k], np.float32)
        poses.append((R.astype(np.float32), t))
    return X, poses


def _kb8_scaled_problem(rng, s, with_rcam):
    """Mono-consistent scaled replica of a KB8 rig scene: zero left-image
    residual at any scale; only the right-camera rows (through the
    METRIC rig extrinsics) make scale observable."""
    from tpuslam.geometry import cameras

    K, M = 4, 250
    X, poses = _kb8_scene(rng, K=K, M=M)
    R_rl, t_rl = _kb8_rig()
    obs_uv = np.zeros((K, M, 2), np.float32)
    obs_uvr = np.full((K, M, 2), -1.0, np.float32)
    obs_mask = np.zeros((K, M), bool)
    for k, (R, t) in enumerate(poses):
        Xc = X @ R.T + t
        uv = np.asarray(cameras.project(jnp.asarray(Xc), KB8, "kb8"))
        Xr = Xc @ R_rl.T + t_rl
        uvr = np.asarray(cameras.project(jnp.asarray(Xr), KB8_R, "kb8"))
        ok = (Xc[:, 2] > 0.3) & (Xr[:, 2] > 0.3)
        obs_uv[k] = uv
        obs_mask[k] = ok
        obs_uvr[k] = np.where(ok[:, None], uvr, -1.0)

    fixed = np.zeros(K, bool)
    fixed[0] = True
    kf_R = np.stack([p[0] for p in poses])
    kf_t = np.stack([s * p[1] for p in poses])
    return local_ba.BAProblem(
        kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
        kf_fixed=jnp.asarray(fixed),
        points=jnp.asarray(s * X), pt_valid=jnp.ones(M, bool),
        obs_uv=jnp.asarray(obs_uv), obs_mask=jnp.asarray(obs_mask),
        obs_inv_sigma2=jnp.ones((K, M), jnp.float32),
        obs_uvr=jnp.asarray(obs_uvr) if with_rcam else None,
    ), X, poses, (jnp.asarray(R_rl), jnp.asarray(t_rl))


def test_local_ba_rcam_recovers_metric_scale(rng):
    """Right-camera reprojection rows pin metric scale for KB8 rigs the
    way the u-bf/z row does for rectified stereo."""
    s = 0.85
    prob, X, poses, (R_rl, t_rl) = _kb8_scaled_problem(
        rng, s, with_rcam=True)
    res = local_ba.optimize(prob, KB8, model="kb8", iters=25,
                            cam_params_r=KB8_R, R_rl=R_rl, t_rl=t_rl)
    for k in range(1, 4):
        ratio = (np.linalg.norm(np.asarray(res.kf_t[k]))
                 / np.linalg.norm(poses[k][1]))
        assert abs(ratio - 1.0) < 0.03, (k, ratio)
    perr = np.linalg.norm(np.asarray(res.points) - X, axis=1)
    assert np.median(perr) < 0.08, np.median(perr)


def test_local_ba_kb8_mono_cannot_fix_scale(rng):
    """Control: the same problem without right rows keeps the replica
    scale (mono KB8 BA is scale-blind)."""
    s = 0.85
    prob, X, poses, _ = _kb8_scaled_problem(rng, s, with_rcam=False)
    res = local_ba.optimize(prob, KB8, model="kb8", iters=25)
    for k in range(1, 4):
        ratio = (np.linalg.norm(np.asarray(res.kf_t[k]))
                 / np.linalg.norm(poses[k][1]))
        assert abs(ratio - s) < 0.03, (k, ratio)


def test_pose_opt_rcam_converges_and_gates(rng):
    """Pose-only right-camera rows (EdgeSE3ProjectXYZToBodyOnlyPose,
    ref OptimizableTypes.h:181): pose converges and the joint 4-dof
    chi2 gate rejects keypoints whose RIGHT match is wrong even though
    their left rows are perfect."""
    from tpuslam.geometry import cameras

    X, _ = _kb8_scene(rng, K=1, M=150)
    R_rl, t_rl = _kb8_rig()
    R_true = np.eye(3, dtype=np.float32)
    t_true = np.array([0.1, 0.0, 0.15], np.float32)
    Xc = X @ R_true.T + t_true
    uv = np.asarray(cameras.project(jnp.asarray(Xc), KB8, "kb8"))
    Xr = Xc @ R_rl.T + t_rl
    uvr = np.asarray(cameras.project(jnp.asarray(Xr), KB8_R, "kb8"))
    bad = np.zeros(150, bool)
    bad[:20] = True
    uvr_obs = uvr.copy()
    uvr_obs[bad, 0] += 20.0

    dR = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.03,
                                            jnp.float32)))
    R0 = jnp.asarray(dR @ R_true)
    t0 = jnp.asarray(t_true + rng.normal(size=3).astype(np.float32) * 0.1)
    res = pose_opt.optimize_pose(
        R0, t0, jnp.asarray(X), jnp.asarray(uv), jnp.ones(150),
        jnp.ones(150, bool), KB8, model="kb8",
        uvr=jnp.asarray(uvr_obs), cam_params_r=KB8_R,
        R_rl=jnp.asarray(R_rl), t_rl=jnp.asarray(t_rl),
    )
    assert np.linalg.norm(res.t - t_true) < 0.02
    inl = np.asarray(res.inlier)
    assert inl[bad].sum() == 0, inl[bad].sum()
    assert inl[~bad].sum() > 120
