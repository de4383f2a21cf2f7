import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.geometry import lie, triangulation, two_view
from tpuslam.solver import local_ba, pose_opt

CAM = jnp.array([450.0, 450.0, 320.0, 240.0], jnp.float32)
FOCAL = 450.0


def make_scene(rng, n_pts=200, n_kf=4, spread=4.0, depth=8.0):
    """Random world points + cameras looking down +z from a small baseline."""
    X = rng.uniform([-spread, -spread, depth - 2], [spread, spread, depth + 2],
                    size=(n_pts, 3)).astype(np.float32)
    poses = []
    for k in range(n_kf):
        w = rng.normal(size=3) * 0.02
        R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
        t = np.array([0.4 * k - 0.2 * n_kf, 0.1 * rng.normal(), 0.05 * k],
                     np.float32)
        poses.append((R.astype(np.float32), t))
    return jnp.asarray(X), poses


def project_np(R, t, X):
    Xc = X @ np.asarray(R).T + np.asarray(t)
    return np.stack(
        [450.0 * Xc[:, 0] / Xc[:, 2] + 320.0, 450.0 * Xc[:, 1] / Xc[:, 2] + 240.0],
        axis=1,
    ).astype(np.float32), Xc[:, 2]


def test_pose_optimize_recovers_pose(rng):
    X, poses = make_scene(rng, n_pts=150, n_kf=1)
    R_true, t_true = poses[0]
    uv, _ = project_np(R_true, t_true, np.asarray(X))
    uv = uv + rng.normal(0, 0.5, uv.shape).astype(np.float32)

    # Perturbed init.
    dR = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.03, jnp.float32)))
    R0 = jnp.asarray(dR @ R_true)
    t0 = jnp.asarray(t_true + rng.normal(size=3).astype(np.float32) * 0.1)

    res = pose_opt.optimize_pose(
        R0, t0, X, jnp.asarray(uv), jnp.ones(150), jnp.ones(150, bool), CAM
    )
    err_t = np.linalg.norm(res.t - t_true)
    err_R = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(R_true).T @ res.R)))
    assert err_t < 0.01, err_t
    assert err_R < 0.005, err_R
    assert int(res.n_inliers) > 140


def test_pose_optimize_rejects_outliers(rng):
    X, poses = make_scene(rng, n_pts=200, n_kf=1)
    R_true, t_true = poses[0]
    uv, _ = project_np(R_true, t_true, np.asarray(X))
    uv = uv + rng.normal(0, 0.5, uv.shape).astype(np.float32)
    # 25% gross outliers.
    n_out = 50
    out_idx = rng.choice(200, n_out, replace=False)
    uv[out_idx] += rng.uniform(20, 80, (n_out, 2)).astype(np.float32)

    dR = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.02, jnp.float32)))
    R0 = jnp.asarray(dR @ R_true)
    t0 = jnp.asarray(t_true + rng.normal(size=3).astype(np.float32) * 0.05)

    res = pose_opt.optimize_pose(
        R0, t0, X, jnp.asarray(uv), jnp.ones(200), jnp.ones(200, bool), CAM
    )
    inl = np.asarray(res.inlier)
    assert inl[out_idx].sum() <= 3, "outliers not rejected"
    assert inl.sum() > 130
    err_t = np.linalg.norm(res.t - t_true)
    assert err_t < 0.02, err_t


def test_triangulation_exact(rng):
    X, poses = make_scene(rng, n_pts=100, n_kf=2)
    (R1, t1), (R2, t2) = poses
    Xn = np.asarray(X)
    b1 = (Xn @ R1.T + t1)
    b1 = b1 / b1[:, 2:3]
    b2 = (Xn @ R2.T + t2)
    b2 = b2 / b2[:, 2:3]
    Xt = triangulation.triangulate_dlt(
        jnp.asarray(R1), jnp.asarray(t1), jnp.asarray(R2), jnp.asarray(t2),
        jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32)
    )
    err = np.linalg.norm(np.asarray(Xt) - Xn, axis=1)
    assert np.median(err) < 0.01, np.median(err)
    chk = triangulation.check_triangulation(
        jnp.asarray(R1), jnp.asarray(t1), jnp.asarray(R2), jnp.asarray(t2),
        Xt, jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32),
        focal=FOCAL,
    )
    assert np.asarray(chk.ok).mean() > 0.9


def test_two_view_reconstruction(rng):
    n = 300
    X = rng.uniform([-4, -4, 5], [4, 4, 12], size=(n, 3)).astype(np.float32)
    R1, t1 = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
    w = np.array([0.02, -0.05, 0.01], np.float32)
    R2 = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t2 = np.array([-0.8, 0.1, 0.05], np.float32)

    def bearings(R, t):
        Xc = X @ R.T + t
        return (Xc / Xc[:, 2:3]).astype(np.float32)

    b1, b2 = bearings(R1, t1), bearings(R2, t2)
    # pixel noise ~0.5px -> normalized
    b1[:, :2] += rng.normal(0, 0.5 / FOCAL, (n, 2))
    b2[:, :2] += rng.normal(0, 0.5 / FOCAL, (n, 2))
    valid = np.ones(n, bool)
    valid[rng.choice(n, 40, replace=False)] = False  # some invalid matches
    bad = rng.choice(np.nonzero(valid)[0], 30, replace=False)
    b2[bad, :2] += rng.uniform(0.05, 0.2, (30, 2))  # gross outliers

    res = two_view.reconstruct(
        jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(valid),
        jax.random.PRNGKey(0), focal=FOCAL,
    )
    assert bool(res.ok)
    # Rotation error.
    dR = np.asarray(res.R21) @ R2.T
    ang = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR, jnp.float32))))
    assert ang < 0.01, ang
    # Translation direction error (scale unobservable).
    t_est = np.asarray(res.t21)
    cos = abs(t_est @ t2 / np.linalg.norm(t2))
    assert cos > 0.999, cos
    # Structure: scale-align and compare.
    good = np.asarray(res.good)
    assert good.sum() > 150
    s = np.median(X[good][:, 2]) / np.median(np.asarray(res.X1)[good][:, 2])
    err = np.linalg.norm(np.asarray(res.X1)[good] * s - X[good], axis=1)
    # Depth noise floor: sigma_z ~ z^2 * sigma_px / (f * baseline) ~ 0.09 m
    # at depth 8, baseline 0.8, 0.5 px noise — BA refines this later.
    assert np.median(err) < 0.2, np.median(err)


def test_local_ba_converges(rng):
    K, M = 4, 300
    X, poses = make_scene(rng, n_pts=M, n_kf=K)
    Xn = np.asarray(X)
    obs_uv = np.zeros((K, M, 2), np.float32)
    obs_mask = np.zeros((K, M), bool)
    for k, (R, t) in enumerate(poses):
        uv, z = project_np(R, t, Xn)
        obs_uv[k] = uv + rng.normal(0, 0.4, uv.shape).astype(np.float32)
        obs_mask[k] = (z > 0.5)

    # Perturb non-fixed poses and all points. Two anchors: one fixed pose
    # leaves the monocular scale gauge free (the reference's fixed second
    # ring plays the same role).
    kf_R, kf_t = [], []
    fixed = np.zeros(K, bool)
    fixed[0] = True
    fixed[1] = True
    for k, (R, t) in enumerate(poses):
        if fixed[k]:
            kf_R.append(R)
            kf_t.append(t)
        else:
            dR = np.asarray(
                lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.01, jnp.float32)))
            kf_R.append((dR @ R).astype(np.float32))
            kf_t.append(t + rng.normal(size=3).astype(np.float32) * 0.05)
    pts0 = Xn + rng.normal(size=Xn.shape).astype(np.float32) * 0.05

    prob = local_ba.BAProblem(
        kf_R=jnp.asarray(np.stack(kf_R)),
        kf_t=jnp.asarray(np.stack(kf_t)),
        kf_fixed=jnp.asarray(fixed),
        points=jnp.asarray(pts0),
        pt_valid=jnp.ones(M, bool),
        obs_uv=jnp.asarray(obs_uv),
        obs_mask=jnp.asarray(obs_mask),
        obs_inv_sigma2=jnp.ones((K, M), jnp.float32),
    )
    res = local_ba.optimize(prob, CAM, iters=15)

    # Fixed keyframe untouched.
    np.testing.assert_allclose(res.kf_R[0], poses[0][0], atol=1e-6)
    np.testing.assert_allclose(res.kf_t[0], poses[0][1], atol=1e-6)

    # Non-fixed poses recovered (up to noise floor).
    for k in range(1, K):
        err_t = np.linalg.norm(res.kf_t[k] - poses[k][1])
        assert err_t < 0.01, (k, err_t)
    # Residual chi2 consistent with 0.4px noise: E[chi2] ~ 2*sigma^2.
    chi2 = np.asarray(res.chi2)[np.asarray(res.inlier)]
    assert chi2.mean() < 1.0, chi2.mean()
    # Points close to truth.
    perr = np.linalg.norm(np.asarray(res.points) - Xn, axis=1)
    # Depth noise floor ~ z^2 sigma/(f b) ~ 0.05 m for this geometry.
    assert np.median(perr) < 0.08, np.median(perr)


def test_local_ba_ignores_masked_obs(rng):
    """Observations outside the mask must not affect the solution."""
    K, M = 3, 100
    X, poses = make_scene(rng, n_pts=M, n_kf=K)
    Xn = np.asarray(X)
    obs_uv = np.zeros((K, M, 2), np.float32)
    obs_mask = np.zeros((K, M), bool)
    for k, (R, t) in enumerate(poses):
        uv, z = project_np(R, t, Xn)
        obs_uv[k] = uv
        obs_mask[k] = True
    # Garbage in masked-out entries.
    obs_mask[1, :50] = False
    obs_uv[1, :50] = 1e5

    prob = local_ba.BAProblem(
        kf_R=jnp.asarray(np.stack([p[0] for p in poses])),
        kf_t=jnp.asarray(np.stack([p[1] for p in poses])),
        kf_fixed=jnp.asarray(np.array([True, False, False])),
        points=jnp.asarray(Xn),
        pt_valid=jnp.ones(M, bool),
        obs_uv=jnp.asarray(obs_uv),
        obs_mask=jnp.asarray(obs_mask),
        obs_inv_sigma2=jnp.ones((K, M), jnp.float32),
    )
    res = local_ba.optimize(prob, CAM, iters=5)
    for k in range(K):
        np.testing.assert_allclose(res.kf_t[k], poses[k][1], atol=1e-3)
    assert np.all(np.isfinite(np.asarray(res.points)))


def test_ransac_pnp_recovers_pose(rng):
    """Batched EPnP RANSAC recovers a pose far from any hint, with 30%
    outliers (the MLPnP role in relocalization, Tracking.cc:3811)."""
    import jax

    from tpuslam.geometry import lie
    from tpuslam.solver import pnp

    from tpuslam.datasets import synthetic

    N = 200
    Xw = rng.uniform([-4, -4, -2], [4, 4, 2], size=(N, 3)).astype(np.float32)
    R, t = synthetic.look_at(np.array([6.0, -5.0, 1.0]),
                             np.zeros(3))
    Xc = Xw @ R.T + t
    bear = (Xc / Xc[:, 2:3]).astype(np.float32)
    valid = Xc[:, 2] > 0.2
    # 30% outliers: corrupt bearings.
    out = rng.choice(N, 60, replace=False)
    bear[out, :2] += rng.uniform(0.05, 0.3, (60, 2)).astype(np.float32)

    res = pnp.ransac_pnp(jnp.asarray(Xw), jnp.asarray(bear),
                         jnp.asarray(valid), jax.random.PRNGKey(0),
                         inlier_th=0.01)
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.R), R, atol=2e-2)
    np.testing.assert_allclose(np.asarray(res.t), t, atol=0.15)
    inl = np.asarray(res.inlier)
    assert inl[out].sum() <= 3


def test_two_view_planar_homography(rng):
    """Planar scene: the essential path is degenerate; model selection
    must route through the homography (ReconstructH,
    /root/reference/src/TwoViewReconstruction.cc:120,577)."""
    n = 300
    # Points on the z = 8 + 0.3x + 0.2y plane (strictly planar).
    xy = rng.uniform(-4, 4, size=(n, 2)).astype(np.float32)
    X = np.concatenate(
        [xy, (8.0 + 0.3 * xy[:, :1] + 0.2 * xy[:, 1:2])], axis=1)
    R1, t1 = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
    R2 = np.asarray(lie.so3_exp(jnp.asarray([0.03, -0.04, 0.02],
                                            jnp.float32)))
    t2 = np.array([-0.7, 0.15, 0.1], np.float32)

    def bearings(R, t):
        Xc = X @ R.T + t
        return (Xc / Xc[:, 2:3]).astype(np.float32)

    b1, b2 = bearings(R1, t1), bearings(R2, t2)
    b1[:, :2] += rng.normal(0, 0.5 / FOCAL, (n, 2))
    b2[:, :2] += rng.normal(0, 0.5 / FOCAL, (n, 2))
    bad = rng.choice(n, 25, replace=False)
    b2[bad, :2] += rng.uniform(0.05, 0.2, (25, 2))

    res = two_view.reconstruct(
        jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(np.ones(n, bool)),
        jax.random.PRNGKey(0), focal=FOCAL,
    )
    assert bool(res.used_h), "planar scene must select the homography"
    assert bool(res.ok)
    dR = np.asarray(res.R21) @ R2.T
    ang = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR,
                                                            jnp.float32))))
    assert ang < 0.02, ang
    t_est = np.asarray(res.t21)
    cos = abs(t_est @ t2 / np.linalg.norm(t2))
    assert cos > 0.995, cos


def test_two_view_general_scene_picks_essential(rng):
    """Deep 3D scene must stay on the essential path."""
    n = 300
    X = rng.uniform([-4, -4, 5], [4, 4, 12], size=(n, 3)).astype(np.float32)
    R2 = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.05, 0.01],
                                            jnp.float32)))
    t2 = np.array([-0.8, 0.1, 0.05], np.float32)
    b1 = (X / X[:, 2:3]).astype(np.float32)
    Xc = X @ R2.T + t2
    b2 = (Xc / Xc[:, 2:3]).astype(np.float32)
    b1[:, :2] += rng.normal(0, 0.5 / FOCAL, (n, 2))
    b2[:, :2] += rng.normal(0, 0.5 / FOCAL, (n, 2))
    res = two_view.reconstruct(
        jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(np.ones(n, bool)),
        jax.random.PRNGKey(0), focal=FOCAL,
    )
    assert not bool(res.used_h)
    assert bool(res.ok)
